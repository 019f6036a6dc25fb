from .config import RealtimeAgentConfig
from .resources import RealtimeAgentResources
from .stats import RealtimeAgentStats, RealtimeAgentStatsCollection
from .profiler import RealtimeAgentProfiler, RealtimeAgentProfilerCollection
from .agent import RealtimeAgent, RealtimeAgentMultiprocessing, RealtimeAgentMultiprocessingInfo

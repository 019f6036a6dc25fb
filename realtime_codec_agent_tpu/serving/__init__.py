from .backend import CompletionBackend
from .server import CompletionServer
from .client import CompletionsClient
from .duplex_server import DuplexServingServer
from .duplex_client import DuplexCall

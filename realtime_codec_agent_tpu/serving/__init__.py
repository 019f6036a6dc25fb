from .backend import CompletionBackend
from .server import CompletionServer
from .client import CompletionsClient

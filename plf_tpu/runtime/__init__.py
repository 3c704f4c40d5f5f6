from . import native
from .executor import StreamingExecutor

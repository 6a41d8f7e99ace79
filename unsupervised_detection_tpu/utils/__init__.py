from .cache import enable_compilation_cache
from .profiling import StepTimer, sync, trace

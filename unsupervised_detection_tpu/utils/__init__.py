from .cache import enable_compilation_cache

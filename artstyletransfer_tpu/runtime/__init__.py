from .executor import Executor, Task  # noqa: F401

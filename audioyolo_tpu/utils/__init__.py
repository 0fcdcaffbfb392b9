from .profiling import annotate, profile_trace  # noqa: F401
from .seeding import seed_everything  # noqa: F401
from .logging import setup_logging  # noqa: F401

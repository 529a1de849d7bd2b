from .checkpoint import Manifest, run_resumable  # noqa: F401

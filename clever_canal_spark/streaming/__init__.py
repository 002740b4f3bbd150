from .pipeline import CdcPipeline, run_available

__all__ = ["CdcPipeline", "run_available"]

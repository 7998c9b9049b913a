from .pipeline import ExtractionRun, run_extraction, resume_or_run

__all__ = ["ExtractionRun", "run_extraction", "resume_or_run"]

"""End-to-end pipelines composed from stages, with checkpoint/resume."""

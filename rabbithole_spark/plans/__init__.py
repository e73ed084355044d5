"""Pipeline spec layer — the reference's YAML config surface compiled to
Spark Structured Streaming plans (SURVEY.md §1.3, §3.1)."""

"""Operator surface: relational core (SURVEY.md §2) + LLM-data-pipeline
extensions (dedup / similarity / text / multimodal)."""

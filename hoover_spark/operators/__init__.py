"""Graph kernels and data-pipeline operators (SURVEY.md §2)."""

"""Pipeline-level models: the end-to-end VO pipelines and the landmark map."""

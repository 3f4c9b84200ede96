"""Pipeline-level models: the end-to-end VO pipelines and the landmark map."""

from . import landmark_map, pipeline  # noqa: F401

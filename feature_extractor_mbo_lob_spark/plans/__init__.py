from .pipeline import build_features, flagship_pipeline  # noqa: F401

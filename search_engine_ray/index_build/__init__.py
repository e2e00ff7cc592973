from .build import BuildConfig, build_index, load_index_manifest

__all__ = ["BuildConfig", "build_index", "load_index_manifest"]

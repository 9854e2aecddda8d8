from .rerank import native_available, re_ranking_native

__all__ = ["native_available", "re_ranking_native"]

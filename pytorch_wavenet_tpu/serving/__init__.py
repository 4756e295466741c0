from .batcher import ContinuousBatcher, GenerationHandle, RequestCancelled

__all__ = ["ContinuousBatcher", "GenerationHandle", "RequestCancelled"]

from .batcher import ContinuousBatcher, GenerationHandle

__all__ = ["ContinuousBatcher", "GenerationHandle"]

from . import attention, embeddings, gru, quaternion, rotation, transformer

__all__ = ["attention", "embeddings", "gru", "quaternion", "rotation",
           "transformer"]

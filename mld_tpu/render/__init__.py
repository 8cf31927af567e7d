from .skeleton import save_skeleton_animation, save_skeleton_frame

__all__ = ["save_skeleton_animation", "save_skeleton_frame"]

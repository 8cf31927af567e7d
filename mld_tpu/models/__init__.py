from .mld import MLD, lengths_to_mask

__all__ = ["MLD", "lengths_to_mask"]

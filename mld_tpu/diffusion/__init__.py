from .schedulers import DDIMScheduler, DDPMScheduler, DiffusionSchedule

__all__ = ["DDIMScheduler", "DDPMScheduler", "DiffusionSchedule"]

from .experiment import experiment_id

__all__ = ["experiment_id"]

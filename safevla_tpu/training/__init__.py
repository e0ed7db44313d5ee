from safevla_tpu.training.online import OnlineTrainer

__all__ = ["OnlineTrainer"]

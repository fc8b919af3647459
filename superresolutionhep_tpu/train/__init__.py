from .schedule import warmup_cosine_epoch_schedule  # noqa: F401

from peppa_tpu.training.optimization import bert_adam, schedule_fn, freeze_mask

__all__ = ["bert_adam", "schedule_fn", "freeze_mask"]

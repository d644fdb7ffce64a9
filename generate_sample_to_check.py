"""Dump random training audio clips to wav for manual listening.

Parity: reference generate_sample_to_check.py.
"""

import os
import random
import wave

import numpy as np
import yaml


def sample(k: int = 50, config_file: str = "hparams_base.yaml",
           out_dir: str = "data/out/audio_sample_to_check") -> None:
    import peppa_tpu.data.dataset as D

    with open(config_file) as f:
        hparams = yaml.safe_load(f)
    data_cfg = hparams["data"]
    train = D.PeppaPigDataset(
        target_size=tuple(data_cfg["target_size"]),
        audio_sample_rate=data_cfg["audio_sample_rate"],
        split=["train"], fragment_type="dialog",
        **{k_: v for k_, v in data_cfg["train"].items()
           if k_ not in ("batch_size", "shuffle", "force_cache")})
    os.makedirs(out_dir, exist_ok=True)
    sr = data_cfg["audio_sample_rate"]
    for i in random.sample(range(len(train)), k):
        audio = np.asarray(train[i].audio).reshape(-1)
        with wave.open(os.path.join(out_dir, f"{i}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes((np.clip(audio, -1, 1) * 32767)
                          .astype("<i2").tobytes())


if __name__ == "__main__":
    sample()

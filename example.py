"""Minimal public "embed audio" API — parity with reference example.py.

Loads the best checkpoint of a run, embeds a directory of wav files, prints
the embedding tensor shape.
"""

import argparse
import glob

import jax
import numpy as np

from peppa_tpu.data.audio import audiofile_loader
from peppa_tpu.training.checkpoint import load_best_model


def main(version_dir: str, audio_glob: str) -> np.ndarray:
    model, variables, config, _ = load_best_model(version_dir)

    @jax.jit
    def encode(vs, audio):
        return model.apply(vs, audio, method=model.encode_audio)

    paths = sorted(glob.glob(audio_glob))
    emb = np.concatenate([np.asarray(encode(variables, batch))
                          for batch in audiofile_loader(paths)])
    print(f"Audio embedding tensor with shape: {emb.shape}")
    return emb


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--version_dir", default="lightning_logs/version_0")
    parser.add_argument("--audio_glob",
                        default="data/out/realign/narration/ep_1/0/*.wav")
    args = parser.parse_args()
    from peppa_tpu.utils.compile_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    main(args.version_dir, args.audio_glob)

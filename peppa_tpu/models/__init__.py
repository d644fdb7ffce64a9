from peppa_tpu.models.dual_encoder import PeppaPig, init_model
from peppa_tpu.models.wav2vec2 import Wav2Vec2Encoder
from peppa_tpu.models.video3d import R3DEncoder
from peppa_tpu.models.resnet2d import ImageEncoder

__all__ = ["PeppaPig", "init_model", "Wav2Vec2Encoder", "R3DEncoder", "ImageEncoder"]

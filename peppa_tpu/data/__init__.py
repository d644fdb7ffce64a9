from peppa_tpu.data.types import Clip, ClipBatch, RawSegment, Stats, Triplet, TripletBatch

__all__ = ["Clip", "ClipBatch", "RawSegment", "Stats", "Triplet", "TripletBatch"]

from .pipeline import SequenceData, StreamingInferencer, pad_lr_frame, crop_sr_output

__all__ = ["SequenceData", "StreamingInferencer", "pad_lr_frame", "crop_sr_output"]

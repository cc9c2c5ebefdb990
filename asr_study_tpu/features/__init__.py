from asr_study_tpu.features.audio import (
    FBank,
    Feature,
    LogFbank,
    MFCC,
    Raw,
    delta,
    frame_signal,
    hz_to_mel,
    mel_filterbank,
    mel_to_hz,
    num_frames,
    power_spectrum,
)
from asr_study_tpu.features.wav import read_wav, write_wav

__all__ = [
    "Feature",
    "Raw",
    "FBank",
    "LogFbank",
    "MFCC",
    "frame_signal",
    "num_frames",
    "power_spectrum",
    "mel_filterbank",
    "hz_to_mel",
    "mel_to_hz",
    "delta",
    "read_wav",
    "write_wav",
]

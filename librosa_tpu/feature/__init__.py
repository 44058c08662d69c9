"""Feature extraction layer (L4)."""

from .spectral import *  # noqa: F401,F403
from .utils import delta, stack_memory  # noqa: F401
from .rhythm import (  # noqa: F401
    tempogram,
    fourier_tempogram,
    tempo,
    tempogram_ratio,
    hybrid_tempogram,
    metrogram,
)
from .inverse import (  # noqa: F401
    mel_to_stft,
    mel_to_audio,
    mfcc_to_mel,
    mfcc_to_audio,
)

"""Multi-device sharding layer.

Long recordings shard by time-block with overlap-save halo exchange
(``ppermute`` over ICI); batched multi-track workloads shard over chips.
Spectrogram outputs are bit-identical to the unsharded computation
(seam-free), replicating the reference's streaming-block seam arithmetic
(``librosa/core/audio.py:223``, ``core/convert.py:409-560``) as sharding
legality rules.
"""

from .mesh import make_mesh, time_mesh, pod_mesh, init_distributed  # noqa: F401
from .sharded import stft_sharded, melspectrogram_sharded  # noqa: F401
from .analysis import (  # noqa: F401
    onset_strength_sharded,
    tempo_sharded,
    pcen_sharded,
    pyin_sharded,
    beat_track_sharded,
    mfcc_sharded,
    chroma_cqt_sharded,
)
from .constantq import cqt_sharded  # noqa: F401
from .effects import hpss_sharded  # noqa: F401

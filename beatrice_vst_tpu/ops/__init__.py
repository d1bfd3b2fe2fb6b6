"""DSP primitives: resampling, gain, pitch math, spherical average, morphing,
and the framed log-mel front end.  All ops are pure, batched, static-shape
JAX functions usable inside `jit`/`scan`."""

from .frontend import MelFrontend, hann_window, mel_filterbank  # noqa: F401
from .gain import db_to_amp, amp_to_db, gain_init_state, gain_process  # noqa: F401
from .morph import (  # noqa: F401
    calculate_marker_weights,
    calculate_voice_weights,
    prepare_voice_morph_weights,
    prune_top_k,
)
from .pitch_math import (  # noqa: F401
    min_max_pitch_to_bins,
    source_pitch_midi_to_bins,
    transform_pitch,
)
from .resample import (  # noqa: F401
    Resampler,
    compute_simple_fraction,
    input_resampler_48k_to_16k,
    make_resampler,
    output_resampler_24k_to_48k,
    rational_rate_ratio,
)
from .spherical_average import spherical_average  # noqa: F401

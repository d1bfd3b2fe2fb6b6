"""The Beatrice-2 stage chain: PhoneExtractor, PitchEstimator,
WaveformGenerator and the composed VoiceConverter, for all three model
versions (2.0.0-alpha.2 / beta.1 / rc.0), with dual chunk/step streaming
APIs and explicit scan-carry state."""

from . import chain, layers, phone_extractor, pitch_estimator, waveform_generator  # noqa: F401
from .chain import VoiceConverterConfig  # noqa: F401

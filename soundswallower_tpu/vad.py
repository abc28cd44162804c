"""Voice activity detection.

API-compatible with the reference ``ps_vad.c`` wrapper (modes, frame
sizing with the closest-supported-rate trick at ps_vad.c:50-115).

The classifier is currently an adaptive-noise-floor energy VAD rather
than a port of the vendored WebRTC GMM VAD (src/common_audio/vad/*).  It
has the same API, frame sizes and aggressiveness semantics; a bit-exact
fixed-point port of the WebRTC filterbank/GMM is planned (the reference
only uses the VAD for endpointing, which is not part of the decoding
parity surface).
"""

from __future__ import annotations

import numpy as np

# vad_mode_t (vad.h)
LOOSE = 0
MEDIUM_LOOSE = 1
MEDIUM_STRICT = 2
STRICT = 3

DEFAULT_SAMPLE_RATE = 16000
DEFAULT_FRAME_LENGTH = 0.03


class Vad:
    """Framewise speech/non-speech classifier."""

    # decision thresholds (in dB over noise floor) per aggressiveness
    _THRESH_DB = {LOOSE: 3.0, MEDIUM_LOOSE: 4.5, MEDIUM_STRICT: 6.0, STRICT: 8.0}

    def __init__(self, mode: int = LOOSE,
                 sample_rate: int = DEFAULT_SAMPLE_RATE,
                 frame_length: float = DEFAULT_FRAME_LENGTH):
        # ps_vad.c:60-88: pick the closest supported sample rate for the
        # internal classifier; frame length must give an integral number
        # of samples at both rates.
        self.sample_rate = sample_rate
        if sample_rate > 48000:
            closest = 48000
        elif sample_rate > 32000:
            closest = 32000
        elif sample_rate > 16000:
            closest = 16000
        else:
            closest = 8000
        self._closest_rate = closest
        self.frame_length = frame_length
        self.frame_size = int(sample_rate * frame_length)
        if abs(self.frame_size - sample_rate * frame_length) > 1e-9:
            raise ValueError("Frame length does not give integer frame size")
        self.mode = mode
        self._noise = None
        self._alpha = 0.95

    def classify(self, frame: np.ndarray) -> bool:
        """Classify one frame of int16 samples as speech (True) or not."""
        frame = np.asarray(frame)
        if frame.dtype != np.int16:
            frame = frame.astype(np.int16)
        if len(frame) != self.frame_size:
            raise ValueError(
                f"Frame has {len(frame)} samples, expected {self.frame_size}")
        x = frame.astype(np.float64)
        energy = np.mean(x * x) + 1.0
        db = 10.0 * np.log10(energy)
        if self._noise is None:
            self._noise = db
        is_speech = db > self._noise + self._THRESH_DB[self.mode]
        # adapt the noise floor on non-speech frames (fast down, slow up)
        if not is_speech:
            a = self._alpha if db > self._noise else 0.7
            self._noise = a * self._noise + (1 - a) * db
        else:
            self._noise += 0.02  # slow upward drift to recover
        return bool(is_speech)

"""soundswallower_tpu: TPU-native finite-state-grammar recognizer and
forced aligner with the capabilities of SoundSwallower, built from scratch
on JAX/XLA/Pallas.

Public API mirrors the reference Python binding
(py/_soundswallower.pyx: Config, Decoder, FsgModel, Vad, Endpointer,
Alignment, AlignmentEntry; py/soundswallower/__init__.py helpers).
"""

from __future__ import annotations

import os

import jax

# The front end requires float64 (see fe/frontend.py); enable x64 globally
# before any tracing.  f32/int paths are unaffected (explicit dtypes).
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the f64 FE graph is expensive to compile;
# cache it across processes.
_cache_dir = os.environ.get(
    "SOUNDSWALLOWER_TPU_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "soundswallower_tpu", "jax"),
)
try:
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover - cache is best-effort
    pass

import collections  # noqa: E402

from .config import Config  # noqa: E402
from .logmath import LogMath  # noqa: E402

__version__ = "0.1.0"

Arg = collections.namedtuple("Arg", ["name", "default", "doc", "type", "required"])
Seg = collections.namedtuple("Seg", ["text", "start", "duration", "ascore", "lscore"])
Hyp = collections.namedtuple("Hyp", ["text", "score", "prob"])


def __getattr__(name):
    # Lazy imports keep `import soundswallower_tpu` light; the heavy
    # modules (jax tracing etc.) load on first use.
    if name == "Decoder":
        from .decoder import Decoder
        return Decoder
    if name == "FsgModel":
        from .fsg import FsgModel
        return FsgModel
    if name == "TpuAligner":
        from .aligner import TpuAligner
        return TpuAligner
    if name == "Vad":
        from .vad import Vad
        return Vad
    if name == "Endpointer":
        from .endpointer import Endpointer
        return Endpointer
    raise AttributeError(name)


__all__ = [
    "Arg",
    "Config",
    "Decoder",
    "Endpointer",
    "FsgModel",
    "Hyp",
    "LogMath",
    "Seg",
    "TpuAligner",
    "Vad",
    "get_audio_data",
    "get_model_path",
]


def get_audio_data(input_file: str):
    """Single-channel WAV or raw audio loader
    (py/soundswallower/__init__.py:43-64)."""
    import wave

    try:
        with wave.open(input_file) as wavfile:
            if wavfile.getnchannels() != 1:
                raise ValueError("Only supporting single-channel WAV")
            data = wavfile.readframes(wavfile.getnframes())
            return data, wavfile.getframerate()
    except wave.Error:
        with open(input_file, "rb") as rawfile:
            return rawfile.read(), None


def get_model_path(subpath: str | None = None) -> str:
    """Locate bundled/reference models (py/soundswallower/__init__.py:27).

    Checks $SOUNDSWALLOWER_MODEL_DIR, then a repo-local ``model/`` dir,
    then the mounted reference models.
    """
    for root in (
        os.environ.get("SOUNDSWALLOWER_MODEL_DIR"),
        os.path.join(os.path.dirname(__file__), "model"),
        "/root/reference/model",
    ):
        if root and os.path.isdir(root):
            return os.path.join(root, subpath) if subpath else root
    raise RuntimeError("No model directory found")

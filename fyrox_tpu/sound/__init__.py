"""Sound layer: batched software mixing (fyrox-sound equivalent)."""

from fyrox_tpu.sound.engine import (SAMPLE_RATE, DistanceModel, SoundBuffers,
                                    SourceState, init_sources, load_wav,
                                    render_block)

__all__ = ["SAMPLE_RATE", "DistanceModel", "SoundBuffers", "SourceState",
           "init_sources", "render_block", "load_wav"]

"""Streaming example (reference flood/example/stream_example.py):
background scheduler thread + per-token stream."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

if _os.environ.get("PIA_PLATFORM"):  # e.g. PIA_PLATFORM=cpu to demo off-TPU
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["PIA_PLATFORM"])
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))


import sys

from simple_example import build_llm

from painlessinferenceacceleration_tpu.engine.request import SamplingParams

if __name__ == "__main__":
    llm = build_llm(sys.argv[1] if len(sys.argv) > 1 else None)
    llm.launch()  # background scheduler
    for tok in llm.stream_generate([11, 22, 33, 44] * 4,
                                   SamplingParams(max_new_tokens=32)):
        print(tok, end=" ", flush=True)
    print()
    llm.shutdown()

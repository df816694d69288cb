"""Neural-net layers (functional): quantized linear, embedding, sampler.

TPU counterparts of flood/flood/layers/* — but functional (params are
pytrees, layers are pure functions) so everything composes with jit/scan/pjit.
"""

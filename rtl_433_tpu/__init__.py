"""tpu_433 — a TPU-native ISM-band receiver framework.

A brand-new framework (JAX / XLA / Pallas / pjit) with the capabilities of
merbanan/rtl_433: batched IQ blocks stream through device kernels for
envelope/magnitude estimation, AM/FM low-pass filtering, OOK/FSK pulse
detection, pulse slicing and a data-parallel bank of protocol decoders.

Layer map (mirrors SURVEY.md section 1, re-designed TPU-first):

- ``io``       — file formats, sample loaders (host side).
- ``dsp``      — per-sample numeric layer: envelope/magnitude, IIR low-pass,
                 FM discriminator, OOK/FSK pulse detection. The hot path:
                 one fused, jitted scan over ``[channels, block]`` sample
                 arrays with a carried-state pytree.
- ``pulse``    — pulse-train data model and slicers (pulse widths -> bits).
- ``bits``     — 2-D bit buffers and bit/CRC/LFSR utilities.
- ``decoders`` — protocol decoder bank + registry (the `-R <n>` contract).
- ``output``   — data model (events) and output sinks.
- ``parallel`` — mesh sharding and multi-host scale-out.
"""

import os as _os

__version__ = "0.3.0"


def _honor_platform_env():
    """The host sitecustomize may force an accelerator platform via
    jax.config, overriding the JAX_PLATFORMS env var.  Honor an explicit
    cpu request while backends are still uninitialized, so subprocesses
    (CLI, tests) never hang on an unavailable accelerator tunnel."""
    if "cpu" in _os.environ.get("JAX_PLATFORMS", ""):
        try:
            import jax
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass


_honor_platform_env()

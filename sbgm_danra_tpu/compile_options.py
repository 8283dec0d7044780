"""Measured TPU compile options, shared by bench and the serving path.

The compiler-option sweep (scripts/xla_flag_sweep.py; docs/DESIGN.md 4a and
BASELINE.md) found that raising the scoped-VMEM limit above the 16 MiB v5e
default lets the fusion emitter keep larger producer chains resident:
+10.5% sampler throughput, flat plateau for 24-64 MiB. These are PJRT
``compiler_options`` — local XLA_FLAGS parsing aborts on TPU backend flags
(the client's XLA build doesn't know them), while compiler options ride the
compile request to the server-side compiler and key the persistent cache.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax

DEFAULT_TPU_COMPILER_OPTIONS = {"xla_tpu_scoped_vmem_limit_kib": "32768"}


def compiler_options() -> Optional[dict]:
    """The compile options to use on this backend; None when not applicable.

    ``SBGM_COMPILER_OPTIONS`` (a JSON object, or ``null``/``{}`` to disable)
    overrides the measured default. CPU/GPU backends reject the TPU knob and
    get None.
    """
    raw = os.environ.get("SBGM_COMPILER_OPTIONS")
    if raw is not None:
        return json.loads(raw) or None
    if jax.default_backend() in ("cpu", "gpu"):
        return None
    return dict(DEFAULT_TPU_COMPILER_OPTIONS)


def compile_lowered(lowered):
    """Compile a ``jax.jit(...).lower(...)`` result with the default options."""
    opts = compiler_options()
    return lowered.compile(compiler_options=opts) if opts else lowered.compile()

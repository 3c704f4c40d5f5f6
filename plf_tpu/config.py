"""Configuration system for the TPU PLF engine.

The reference accelerator exposes one orthogonal config algebra spread over
three binding times (Makefile variables composing the build name, the
xclbin *filename* re-parsed at runtime, and argv — see
``/root/reference/Makefile:14-41`` and ``app/src/include.h:39-75``).  Here the
same axes collapse into a single runtime dataclass:

  =====================  ============================  =======================
  Reference knob         Where it lived                TPU equivalent
  =====================  ============================  =======================
  STATES (DNA/AA)        Makefile STATES               ``states``
  WINDOW_SIZE            AIE window bytes              ``block_sites`` (Pallas
                                                       grid block, in sites)
  AIE_TYPE window/stream window re-send vs stream      (subsumed: Pallas grid
                                                       pipelining; kept for
                                                       the io compat layer)
  PLIO_LAYOUT Comb/Sep   header packing layout         ``layout`` (io packing)
  NUM_ACCELERATORS       9 parallel graph instances    ``instances`` (vmap) /
                                                       mesh data parallelism
  TARGET sw_emu/hw       emulation ladder              ``interpret`` (Pallas
                                                       interpreter / CPU jax)
  =====================  ============================  =======================

The "filename-as-config" codec (`to_name`/`from_name`) round-trips a config
through a reference-style name string for CSV/bench parity
(``include.h:118-146`` parses names like ``plf_mem4window_128x9...``).
"""

from __future__ import annotations

import dataclasses
import re
from enum import Enum
from typing import Optional


class Layout(Enum):
    """Input-buffer packing layout (io compat layer only).

    COMBINED ("1inEV"): EV + branch prepended to both child buffers.
    SEPARATE ("2in"):   EV only on the left buffer.
    See app/src/include.h:52-59, 207-236.
    """

    COMBINED = "combined"
    SEPARATE = "separate"


class AieType(Enum):
    """Streaming discipline of the reference dataflow (io compat only)."""

    WINDOW = "window"
    STREAM = "stream"


class Backend(Enum):
    """Which compute path evaluates the PLF."""

    PALLAS = "pallas"   # fused VPU kernel, bit-exact to the golden model
    XLA = "xla"         # jnp einsum path (fast generic fallback)
    REFERENCE = "reference"  # NumPy golden model (host; testing only)


@dataclasses.dataclass(frozen=True)
class PLFConfig:
    """One config object for the whole engine."""

    states: int = 4            # 4 = DNA, 20 = protein
    categories: int = 4        # gamma rate categories
    block_sites: int = 4096    # Pallas block (the "window size" analogue)
    instances: int = 1         # independent node-pairs batched per call
    layout: Layout = Layout.COMBINED
    aie_type: AieType = AieType.WINDOW
    backend: Backend = Backend.PALLAS
    interpret: bool = False    # Pallas interpreter mode (the sw_emu analogue)
    dtype: str = "float32"     # "float32" (exact) or "bfloat16" (fast mode)

    def __post_init__(self):
        if self.states < 2:
            raise ValueError(f"states must be >= 2, got {self.states}")
        if self.categories < 1:
            raise ValueError(f"categories must be >= 1, got {self.categories}")
        if self.block_sites < 128 or self.block_sites % 128:
            raise ValueError(
                f"block_sites must be a positive multiple of 128 (TPU lane "
                f"width), got {self.block_sites}")
        if self.dtype not in ("float32", "bfloat16"):
            raise ValueError(f"unsupported dtype {self.dtype!r}")

    @property
    def elements_per_site(self) -> int:
        """Floats per alignment site (include.h:153: 16 for DNA)."""
        return self.states * self.categories

    @property
    def rows(self) -> int:
        """Sublane rows of the canonical lane-major CLV layout."""
        return self.states * self.categories

    @property
    def exact(self) -> bool:
        """Whether this config targets bit-exact golden-model equality."""
        return self.dtype == "float32" and self.backend in (
            Backend.PALLAS, Backend.REFERENCE)

    # -- filename-as-config codec (reference parity) -------------------------

    def to_name(self) -> str:
        """Serialise to a reference-style config name.

        Mirrors the xclbin naming scheme ``<app>_<pl>_<aie>`` the reference
        host parses back at runtime (include.h:41-75, README.md:94-99).
        """
        st = "DNA" if self.states == 4 else f"{self.states}state"
        layout = "1inEV" if self.layout is Layout.COMBINED else "2in"
        return (f"plf_tpu{st}{self.aie_type.value}{layout}"
                f"_{self.backend.value}x{self.instances}"
                f"{self.aie_type.value}{self.block_sites}")

    @classmethod
    def from_name(cls, name: str, **overrides) -> "PLFConfig":
        """Parse a reference-style config name (include.h:44-75 semantics)."""
        aie_type = AieType.STREAM if "stream" in name else AieType.WINDOW
        if "1inEV" in name:
            layout = Layout.COMBINED
        elif "2in" in name:
            layout = Layout.SEPARATE
        else:
            layout = Layout.SEPARATE  # reference default (include.h:58)
        m = re.search(r"window(\d+)", name) or re.search(r"stream(\d+)", name)
        block = int(m.group(1)) if m else 4096
        # Reference window sizes are bytes; sites/window = bytes>>4
        # (include.h:156).  Names written by to_name carry sites directly.
        if m and block % 128:
            block = max(128, (block >> 4) // 128 * 128 or 128)
        states = 4
        ms = re.search(r"(\d+)state", name)
        if ms:
            states = int(ms.group(1))
        mi = re.search(r"x(\d+)(?:window|stream)", name)
        instances = int(mi.group(1)) if mi else 1
        backend = Backend.PALLAS
        for b in Backend:
            if b.value in name:
                backend = b
                break
        kw = dict(states=states, block_sites=block, instances=instances,
                  layout=layout, aie_type=aie_type, backend=backend)
        kw.update(overrides)
        return cls(**kw)


DNA = PLFConfig(states=4)
PROTEIN = PLFConfig(states=20)

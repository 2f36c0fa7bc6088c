"""Elliptic curve groups: three 2-cycles of a = 0 short-Weierstrass curves.

Host points (exact Python-int arithmetic, :mod:`nova_tpu.curves.spec`) back
the sequential protocol paths; device kernels (:mod:`nova_tpu.curves.jpoints`)
back the vectorized MSM/commitment paths.
"""

from nova_tpu.curves.spec import (
    CurveSpec,
    AffinePoint,
    pallas,
    vesta,
    bn254,
    grumpkin,
    secp256k1,
    secq256k1,
)

__all__ = [
    "CurveSpec",
    "AffinePoint",
    "pallas",
    "vesta",
    "bn254",
    "grumpkin",
    "secp256k1",
    "secq256k1",
]

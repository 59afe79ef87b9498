"""BLS12-381 field specs for the device compute path.

Fp (381-bit base field) as 32 x 12-bit limbs, Fr (255-bit scalar field) as
22 x 12-bit limbs - see :mod:`kzg_rust_tpu.ops.limbs` for the representation
rationale.  These replace the blst ``blst_fp``/``blst_fr`` types
(SURVEY.md section 2.3).
"""

from __future__ import annotations

from ..golden.field import P, R
from .limbs import FieldSpec

FP = FieldSpec("fp", P, 32)
FR = FieldSpec("fr", R, 22)

NLIMBS_FP = FP.nlimbs
NLIMBS_FR = FR.nlimbs

"""JAX/TPU backend.

The TPU tensor path. Heavy vector math (barycentric evaluation, quotient
construction, the fixed-base MSM) runs as jitted JAX programs built from the
limb-tensor kernels in ``kzg_rust_tpu.ops``; host-scalar pieces (single
G1/G2 scalar mults, the pairing check - O(1) work per call) currently reuse
the golden implementations and are replaced as the ops layer grows.
"""

from __future__ import annotations

from .golden_backend import GoldenBackend


class JaxBackend(GoldenBackend):
    name = "jax"

    def __init__(self):
        super().__init__()
        self._ctx = {}  # per-settings device state (limb tensors, MSM tables)

    # -- polynomial math (device) --------------------------------------------

    def _fr_ctx(self, settings):
        key = id(settings)
        if key not in self._ctx:
            from ..ops import protocol_kernels as pk

            self._ctx[key] = pk.FrContext.build(settings)
        return self._ctx[key]

    def barycentric_eval(self, settings, evals, x: int) -> int:
        from ..ops import protocol_kernels as pk

        return pk.barycentric_eval(self._fr_ctx(settings), evals, x)

    def quotient_out_of_domain(self, settings, evals, z: int, y: int):
        from ..ops import protocol_kernels as pk

        return pk.quotient_out_of_domain(self._fr_ctx(settings), evals, z, y)

    def quotient_in_domain(self, settings, evals, z: int, y: int, m: int):
        from ..ops import protocol_kernels as pk

        return pk.quotient_in_domain(self._fr_ctx(settings), evals, z, y, m)

    # -- MSM (device) ---------------------------------------------------------

    def msm_g1_lagrange(self, settings, scalars):
        from ..ops import msm as msm_ops

        ctx = self._msm_ctx(settings)
        if ctx is None:  # tiny presets fall back to the host path
            return super().msm_g1_lagrange(settings, scalars)
        return msm_ops.msm_fixed_base(ctx, scalars)

    def _msm_ctx(self, settings):
        key = ("msm", id(settings))
        if key not in self._ctx:
            from ..ops import msm as msm_ops

            n = settings.preset.field_elements_per_blob
            if n < 8:
                self._ctx[key] = None
            else:
                self._ctx[key] = msm_ops.MsmContext.build(settings)
        return self._ctx[key]

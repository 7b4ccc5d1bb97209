"""Model complexity reporting: parameter count + analytical FLOPs.

Replaces the reference's fvcore FlopCountAnalysis (`eval_zeroshot.py:80-83`)
with XLA's own cost analysis of the compiled forward — the number XLA
actually schedules against, on the hardware that runs it.
"""

from __future__ import annotations

import jax

from vipformer_tpu.utils import param_count


def forward_flops(model, variables, *sample_args) -> float:
    """Analytical FLOPs of one compiled eval-mode forward.

    Lowered with every Pallas kernel forced to its XLA path: the cost model
    reports 0 FLOPs for custom calls, so counting with the kernels live
    would drop the attention/stem matmuls from the total (the r2 bench's
    documented MFU under-count)."""
    from vipformer_tpu.ops.pallas import xla_reference_mode

    def fwd(v, *args):
        return model.apply(v, *args, deterministic=True)

    with xla_reference_mode():
        lowered = jax.jit(fwd).lower(variables, *sample_args)
        try:
            cost = lowered.compile().cost_analysis()
        except Exception:
            cost = lowered.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost.get("flops", -1.0))


def complexity_report(model, variables, *sample_args) -> dict:
    return {
        "params": param_count(variables["params"]),
        "flops_per_batch": forward_flops(model, variables, *sample_args),
    }

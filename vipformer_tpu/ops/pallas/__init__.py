from vipformer_tpu.ops.pallas.fps import fps_pallas

__all__ = ["fps_pallas"]

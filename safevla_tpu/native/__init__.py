from safevla_tpu.native.obs_ring import ObsRing, native_available, build_native

__all__ = ["ObsRing", "native_available", "build_native"]

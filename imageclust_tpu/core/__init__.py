from imageclust_tpu.core.mesh import create_mesh, data_sharding, replicated

__all__ = ["create_mesh", "data_sharding", "replicated"]

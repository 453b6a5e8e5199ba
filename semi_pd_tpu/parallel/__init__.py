from semi_pd_tpu.parallel.mesh import create_mesh

__all__ = ["create_mesh"]

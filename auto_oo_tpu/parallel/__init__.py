from .sharding import (make_mesh, sharded_full_hessian_fn,
                       sharded_nr_step_fn, GeometryBatch)

__all__ = ["make_mesh", "sharded_full_hessian_fn", "sharded_nr_step_fn",
           "GeometryBatch"]

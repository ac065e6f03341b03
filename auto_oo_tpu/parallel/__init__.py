from .sharding import (make_mesh, sharded_full_hessian_fn,
                       sharded_grad_hess_fn, sharded_nr_step_fn,
                       GeometryBatch)
from .statevector import (sharded_state_fn, sharded_rdms_fn,
                          sharded_int2e_transform_fn, sharded_energy_fn)
from .grid_sharded import (row_sharded_sector_fns,
                           row_sharded_gradient_optimization,
                           grid2d_nr_fns)
from .distributed import initialize_distributed, global_mesh

__all__ = ["make_mesh", "sharded_full_hessian_fn", "sharded_grad_hess_fn",
           "sharded_nr_step_fn", "GeometryBatch", "sharded_state_fn",
           "sharded_rdms_fn", "sharded_int2e_transform_fn",
           "sharded_energy_fn", "row_sharded_sector_fns",
           "row_sharded_gradient_optimization", "grid2d_nr_fns",
           "initialize_distributed", "global_mesh"]

from ndt_tpu.parallel.mesh import (  # noqa: F401
    make_pixel_mesh,
    render_grid_sharded,
    shard_rays,
)

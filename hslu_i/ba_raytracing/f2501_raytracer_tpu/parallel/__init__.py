from .mesh import (
    cast_nearest_objsharded,
    make_mesh,
    render_image_sharded,
    shard_scene,
    trace_rays_sharded,
)

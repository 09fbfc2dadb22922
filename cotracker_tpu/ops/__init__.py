from cotracker_tpu.ops.bilinear import (  # noqa: F401
    bilinear_sample,
    bilinear_sample_3d,
    sample_features_2d,
    sample_features_3d,
    interp_matrix_1d,
    resize_bilinear,
    resize_linear_1d,
)
from cotracker_tpu.ops.embeddings import (  # noqa: F401
    get_1d_sincos_pos_embed,
    get_2d_sincos_pos_embed,
    get_2d_embedding,
    posenc,
)
from cotracker_tpu.ops.samplers import (  # noqa: F401
    get_points_on_a_grid,
    get_uniformly_sampled_pts,
    get_sift_sampled_pts,
    get_superpoint_sampled_pts,
)
from cotracker_tpu.ops.masked import reduce_masked_mean, masked_mean, masked_mean_var  # noqa: F401

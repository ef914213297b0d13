from .metrics import (  # noqa: F401
    batch_post_process_disparity, compute_ate, compute_depth_errors,
    compute_re)

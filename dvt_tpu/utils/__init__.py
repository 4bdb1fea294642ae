from dvt_tpu.utils.visualization import (
    get_robust_pca,
    get_pca_map,
    get_scale_map,
    get_similarity_map,
    get_cluster_map,
    hcat,
    vcat,
    add_border,
    visualize_offline_denoised_samples,
    visualize_online_denoised_samples,
)

__all__ = [
    "get_robust_pca",
    "get_pca_map",
    "get_scale_map",
    "get_similarity_map",
    "get_cluster_map",
    "hcat",
    "vcat",
    "add_border",
    "visualize_offline_denoised_samples",
    "visualize_online_denoised_samples",
]

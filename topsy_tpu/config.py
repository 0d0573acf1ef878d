"""Tunables for the TPU-native renderer.

Behavioural constants mirror the reference semantics (reference:
src/topsy/config.py:1-44); TPU-specific constants (pyramid depth, chunk
sizes, matmul tile shapes) are new and tuned for TPU v5e.
"""

# ---------------------------------------------------------------- display ---
DEFAULT_RESOLUTION = 1024
DEFAULT_COLORMAP = "twilight_shifted"

DEFAULT_SCALE = 200.0  # viewport half-width in kpc

TARGET_FPS = 30  # adaptive LOD keeps this
INITIAL_PARTICLES_TO_RENDER = 1e5
STATUS_LINE_UPDATE_INTERVAL = 0.2  # seconds
STATUS_LINE_UPDATE_INTERVAL_RAPID = 0.05

GLIDE_TIME = 0.3  # seconds after double click to reach destination

COLORBAR_ASPECT_RATIO = 0.15
COLORMAP_NUM_SAMPLES = 1000

TEST_DATA_NUM_PARTICLES_DEFAULT = int(1e6)

# ------------------------------------------------------------ particle LOD --
MAX_PARTICLES_PER_BUFFER = 2**27
# kept for API parity with the reference buffer splitting; on TPU this is the
# per-shard particle capacity before arrays are split across device shards.

MAX_PARTICLES_PER_EXPORT_RENDERCALL = 2**25
# EXPORT renders are chunked into calls of at most this many particles.

DEFAULT_CELLS_NSIDE = 16
# spatial grid used for geometric culling (reference: config.py:27-31)

CELL_LAYOUT_FRACTIONAL_PADDING = 1e-5

# fraction of the frame budget below which no new block is attempted
FRAME_BUDGET_CUTOFF_FRACTION = 0.4

JUPYTER_UI_LAG = 0.05

PROJECTED_DENSITY_NAME = "Projected density"

MAX_SURFACE_SMOOTH_PIXELS = 100

# ------------------------------------------------------------- TPU renderer --
SPLAT_KERNEL_RANK = 2
# rank of the separable (eigen) decomposition of the projected SPH kernel;
# rank 2 reproduces the kernel to 1.3e-3 of peak (rank 3: 1.0e-3 — no
# meaningful gain), and the VPU profile-evaluation cost in the splat kernel
# scales linearly with rank.

SPLAT_POLY_DEGREE = 6
# degree (in t^2) of the polynomial fit to each kernel eigen-profile.  The
# fit is constrained to be exactly zero at the support edge (t^2 = 4) so the
# device evaluator needs no support mask — it just clamps t^2 to 4.  The
# constrained degree-6 fit reproduces the kernel to ~1e-3 of peak (slightly
# better than the unconstrained degree-8 fit it replaced).

SPLAT_MAX_HALF_SIZE_PX = 3.5
# pyramid level is chosen so that the smoothing length in level pixels is at
# most this; footprint (radius 2h <= 7px) then fits in a 16px window.

SPLAT_MIN_HALF_SIZE_PX = 0.71
# smoothing lengths are clamped up to this many (level) pixels so that very
# small splats still cover at least one pixel centre on average; mass is
# conserved exactly via the discrete normalization table.

SPLAT_WINDOW = 16
# side of the square footprint window used by the scatter path, and the
# truncation width of giant splats at the coarsest pyramid level.

SPLAT_PYRAMID_LEVELS = 7
# levels 0..6 -> level L resolution = resolution / 2^L (coarsest 16px).

PYRAMID_COLLAPSE_FILTER = "spline"
# reconstruction filter for the density pyramid collapse
# (ops/composite._upsample2x_matrix): 'spline' (interpolating cubic spline,
# B-spline prefilter folded into the matmul — fourth-order), 'catmull'
# (Catmull-Rom, third-order), 'linear'.  Same run-time cost for all three
# (one precomputed (n, 2n) matmul per axis); 'spline' halves the measured
# coarse-level reconstruction bias vs the exact evaluator
# (benchmarks/pyramid_bias.py).

SPLAT_BAND_ROWS = 8
# rows per sort band; group output windows are aligned to this (the group
# sizes and window shapes themselves live in ops/splat_atlas.py /
# ops/splat_pallas.py, where they are tuned together).

SPLAT_ATLAS_PAD = 64
# padding rows between pyramid levels in the atlas canvas (>= WINDOW_ROWS so
# dynamic windows never contaminate a neighbouring level).

SPLAT_ATLAS_COL_PAD = 16
# padding cols on either side of the atlas (edge-clipping margin).

SPLAT_SPILL_GROUP_CAP = 128

SPLAT_FEED_LAUNCH_CAP = 1 << 24
# per-launch particle cap for the fused feed-kernel EXPORT path.  The
# binding constraint is the accumulation kernel's SMEM scalar prefetch
# (5 int32 arrays per group, ~1MB SMEM): 32768 groups = 655KB.  The legacy
# XLA front-end keeps the smaller 2^22 cap (render/store.MAX_BUCKET).
# capacity (in main-pass groups) of the dense-fallback pass for particles
# that do not fit their group's accumulation window (sparsely populated
# regions).  Spills are compacted group-granularly (top-k over per-group
# spill counts + row gather) so the fallback never pays a full-length sort.

EXPORT_USE_PRESORTED = True
# EXPORT renders use the static (smoothing-bucket, Morton) particle order
# (ops/morton.py), skipping the per-frame sort entirely.

EXPORT_USE_FEED = True
# Presorted EXPORT renders run the fused Pallas front-end over the
# transposed field layout (ops/splat_feed.py) — projection, coefficients,
# anchors and flags in one bandwidth-bound pass.  Falls back to the XLA
# front-end automatically off-TPU.

INTERACTIVE_USE_PRESORTED = True
# Interactive (CHANGE/REFINE) frames also skip the per-frame sort: particles
# are shuffled within each presorted group, so LOD subsets are rendered as
# whole-column slices of the (groups x 512) matrix — spatially fair random
# subsamples with exact photometric scale factors (render/sph.py,
# progression.RenderProgressionColumns).  Builds the presort order at the
# first interactive frame (~1 us/particle, one-time per snapshot).

COLUMN_MIP_FLOOR_TARGET = 1 << 20
# decimation-mip tiers (ops/morton_device.build_mip_layout) are chained
# until the deepest tier holds at most ~8x this many particles (chaining
# stops when the next floor would be under the target).  Interactive
# CHANGE frames render whole tiers (progression.py: launch cost is flat
# in slice width), so the deepest tier bounds the mandatory per-frame
# block; 2^20 keeps it a few ms on one chip — a 60 fps budget always has
# an affordable tier, and the budget-driven promotion climbs to larger
# tiers whenever the measured frame time affords them.

COLUMN_MIP_MAX_TIERS = 2
# upper bound on chained decimation tiers (each costs one extra presort
# build over an 8x smaller subsample plus its array copies).

SPLAT_COLUMNS_GROUP_CAP = 1 << 15
# max particle groups per pallas column launch.  The accumulate kernels
# prefetch 5-6 per-group s32 scalar arrays into SMEM (anchors + flags,
# splat_pallas/zsplat_pallas); v5e SMEM is 1.0 MB, so launches beyond
# ~32k groups fail to compile ("Ran out of memory in memory space
# smem").  Column renders over more groups split into group-axis pieces
# (the additive feed path via its native piece=(g0, pg) support, the
# surface path by row-chunking the flat slice) and combine by sum /
# max-composite.  32768 groups x 6 arrays x 4 B = 0.79 MB, inside
# budget with headroom for the kernel's other scalars.

KNN_DEVICE_MAX_N = 1 << 18
# largest snapshot routed to the exact on-device kNN (ops/knn_device.py)
# when a TPU backend is active; larger snapshots use the host OpenMP grid
# search (native/_native.cpp, also exact).  The algorithm itself is
# size-invariant and exact at every scale, but this harness's tunneled
# TPU runtime crashes its worker on the finishing-pass program shapes
# above ~2^19 (benchmarks/knn_scale.py documents the attempts); raise
# this on a runtime that digests them.

AUTORANGE_PERCENTILES = (1.0, 99.9)

GPU_TIMING_SMOOTH_WINDOW = 10  # frames of running-mean for fps display

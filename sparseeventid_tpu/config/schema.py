"""Structured config schema — capability parity with the reference's hydra
ConfigStore tree (/root/reference/src/config/{config,mode,data,framework,
network,optimizer}.py) without the hydra dependency (not available here).

The tree composes the same groups (run / mode / data / framework / encoder /
head) with the same field names and defaults, so reference-style overrides
like ``run.minibatch_size=2 framework.mode=sparse mode.optimizer.name=adam``
work unchanged through the loader in loader.py.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from enum import Enum
from typing import Any, List, Optional, Tuple


# ---- enums (config.py:12-22, network.py:9-23, framework.py:7-15,
#      optimizer.py:8-21, data.py:9-21, mode.py:9-13) --------------------------

class ComputeMode(Enum):
    CPU = 0
    TPU = 1  # replaces CUDA/XPU; the native target here
    CUDA = 2  # accepted for config compatibility; maps to default jax backend


class Precision(Enum):
    float32 = 0
    mixed = 1
    bfloat16 = 2
    float16 = 3


class GrowthRate(Enum):
    multiplicative = 0
    additive = 1


class DownSampling(Enum):
    convolutional = 0
    pooling = 1


class Norm(Enum):
    none = 0
    batch = 1
    layer = 2
    group = 3


class ModeKind(Enum):
    train = 0
    iotest = 1
    inference = 2
    visualize = 3


class LabelType(Enum):
    Classification = 0
    Segmentation = 1


class AccessMode(Enum):
    serial_access = 0
    random_blocks = 1
    random_events = 2


class Detector(Enum):
    dune2d = 0
    dune3d = 1
    synthetic = 2


class DistributedMode(Enum):
    DDP = 0        # accepted; maps to shard_map data parallelism
    horovod = 1    # accepted; maps to shard_map data parallelism
    shard_map = 2  # the native mode


class DataMode(Enum):
    dense = 0
    sparse = 1
    graph = 2


class LossBalanceScheme(Enum):
    none = 0
    even = 1
    focal = 2


class OptimizerKind(Enum):
    adam = 0
    rmsprop = 1
    sgd = 2
    adagrad = 3
    adadelta = 4
    lars = 5
    lamb = 6
    novograd = 7


# ---- leaf groups -------------------------------------------------------------

@dataclass
class LRScheduleConfig:
    name: str = ""
    peak_learning_rate: float = 3e-3


@dataclass
class OneCycleConfig(LRScheduleConfig):
    name: str = "one_cycle"
    min_learning_rate: float = 1e-5
    decay_floor: float = 1e-5
    decay_epochs: int = 5


@dataclass
class WarmupFlatDecayConfig(LRScheduleConfig):
    name: str = "standard"
    decay_floor: float = 1e-3
    decay_epochs: int = 5


@dataclass
class FlatLRConfig(LRScheduleConfig):
    name: str = "flat"


@dataclass
class OptimizerConfig:
    lr_schedule: LRScheduleConfig = field(default_factory=WarmupFlatDecayConfig)
    loss_balance_scheme: LossBalanceScheme = LossBalanceScheme.focal
    name: OptimizerKind = OptimizerKind.adam
    gradient_accumulation: int = 1
    weight_decay: float = 1e-6
    # optax.flatten the update: one big moment/update vector instead of
    # ~166 per-tensor chains.  MEASURED on TPU and rejected as default
    # (PERF_NOTES r5): bench 27.2 vs 29.3 ev/s — the ravel/concat/split
    # of ~20M params costs more HBM traffic than the per-tensor dispatch
    # overhead it saves.  Applied only to ELEMENTWISE optimizers
    # (lars/lamb/novograd use per-layer norms that flattening would
    # change); the opt_state pytree shape changes under this flag
    # (checkpoints are not portable across it).
    flatten_update: bool = False


@dataclass
class Run:
    distributed: bool = False
    compute_mode: ComputeMode = ComputeMode.TPU
    length: int = 1  # epochs
    minibatch_size: int = 2
    id: Any = "debug"
    precision: Precision = Precision.float32
    profile: bool = False
    world_size: int = 1
    seed: int = 0


@dataclass
class Mode:
    name: ModeKind = ModeKind.train
    no_summary_images: bool = True
    weights_location: str = ""
    restore_encoder_only: bool = False


@dataclass
class Train(Mode):
    checkpoint_iteration: int = 50
    summary_iteration: int = 1
    logging_iteration: int = 1
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    quantization_aware: bool = False
    weight_decay: float = 0.0
    iterations: int = 0  # 0 -> derive from run.length (epochs) * dataset size


@dataclass
class Inference(Mode):
    name: ModeKind = ModeKind.inference
    start_index: int = 0
    summary_iteration: int = 1
    logging_iteration: int = 1
    output_file: str = ""  # write per-event softmax here (legacy ana_step parity)


@dataclass
class IOTest(Mode):
    name: ModeKind = ModeKind.iotest
    start_index: int = 0
    iterations: int = 25  # reference iotest times 25 minibatches (exec.py:243)


@dataclass
class Visualize(Mode):
    """Event-display rendering.  The reference CLI advertises this mode but
    dispatches to a method that does not exist
    (/root/reference/bin/exec.py:79-80 -> self.visualize, absent from the
    class) — here it renders per-event projection images with truth labels
    to output_dir/<detector>/<run.id>/visualize/."""

    name: ModeKind = ModeKind.visualize
    start_index: int = 0
    events: int = 8  # how many events to render


@dataclass
class Data:
    name: str = ""
    label: bool = True
    vertex: bool = False
    mode: AccessMode = AccessMode.random_events
    seed: int = -1
    train: str = ""
    test: str = ""
    val: str = ""
    image_key: str = ""
    active: Tuple[str, ...] = ()
    normalize: bool = True
    transform1: bool = False
    transform2: bool = False
    dimension: int = 3
    images: int = 1
    mc: bool = True
    detector: Detector = Detector.synthetic
    max_voxels: int = 50000  # larcv_fetcher.py:116 MaxVoxels
    # SimCLR augmented views are capped far below the supervised budget in
    # the reference (BatchFiller MaxVoxels=3000, larcv_fetcher.py:182,203)
    # — this is also what keeps per-view host-plan building cheap
    aug_max_voxels: int = 3000
    synthetic_events: int = 256  # size of the synthetic dataset


@dataclass
class KernelTuning:
    """Window-engine tuning (ops/pallas/window_conv.WindowTuning).

    ONE source of truth for the knobs the host C++ plan builder and the
    Pallas conv kernels must agree on; the trainer/bench install these via
    ``configure_tuning`` before building models or plans.  ``SEID_*`` env
    vars remain as bisect overrides on top.  None = the kernel default /
    size-based auto dispatch."""

    window_r: Optional[int] = None  # series-conv window rows (shallow)
    window_r_strided: Optional[int] = None  # strided fwd plan window rows
    window_r_initial: Optional[int] = None  # 5^d initial-conv window rows
    window_r_deep: Optional[int] = None  # series window at deep levels
    window_r_deep_from: Optional[int] = None  # first deep level
    p_series: Optional[int] = None  # query tiles per grid step (K<=32)
    fused_bwd: Optional[bool] = None  # fused dX+dW backward kernels
    batched_sidecar: Optional[bool] = None  # v2 batched overflow sidecars


@dataclass
class Framework:
    name: str = "jax"
    mode: DataMode = DataMode.sparse
    distributed_mode: DistributedMode = DistributedMode.shard_map
    oversubscribe: int = 1
    tuning: KernelTuning = field(default_factory=KernelTuning)
    # voxel capacity schedule: per-downsample-level shrink factor for the
    # static COO capacity (1.0 = keep full capacity at every level)
    capacity_shrink: float = 0.5
    min_capacity: int = 1024
    # rematerialize block series in backward (trade FLOPs for HBM)
    remat: bool = True
    # sparse conv engine: 'window' (Pallas sorted-window, primary on TPU)
    # or 'xla' (searchsorted + dynamic gather reference path)
    sparse_backend: str = "window"
    # host-plan cache budget (MB): plans are pure functions of an event's
    # static coords, so epochs >= 2 reuse them instead of paying the
    # ~90 ms/event single-core build (io/plan_cache.py). 0 disables.
    # Default sized for modest hosts (ADVICE r3: 8 GB silently ate small
    # machines); raise it on production hosts — the trainer logs the
    # cache's size/hit-rate once per epoch so saturation is visible.
    plan_cache_mb: int = 2048


@dataclass
class Repr:
    depth: int = 5
    n_initial_filters: int = 32
    n_output_filters: int = 128


@dataclass
class ConvRepresentation(Repr):
    normalization: Norm = Norm.batch
    bias: bool = True
    blocks_per_layer: int = 4
    residual: bool = True
    filter_size: int = 3
    growth_rate: GrowthRate = GrowthRate.additive
    downsampling: DownSampling = DownSampling.convolutional
    leakiness: float = 0.333  # scn.LeakyReLU default leak
    # Legacy 2D multiplane topology (src/networks/torch/sparseresnet.py:
    # 194-334): shared-plane [1,k,k] layers up to plane_merge_depth, then
    # cross-plane [3,k,k] kernels mix the plane axis ("post-merge" stage).
    # -1 = never merge (plane-shared all the way, the current-stack default).
    plane_merge_depth: int = -1
    # Per-label final BlockSeries before the heads (sparseresnet.py:285-333)
    per_label_final_series: bool = False
    # Window-engine static query bound as a fraction of each level's voxel
    # capacity (1.0 = full).  Capacity is a budget, not the workload: tiles
    # past the bound skip the kernel grid; any n_active excess over the
    # bound is surfaced in the overflow/dropped metric (never silent).
    query_bound_frac: float = 1.0
    # Per-level multiplier on query_bound_frac (clamped at 1): occupancy
    # shrinks slower (~0.75x/level on track topologies) than the capacity
    # schedule (~0.5x/level), so deeper levels need a larger fraction.
    query_bound_growth: float = 1.6


@dataclass
class PointNetRepresentation(Repr):
    """PointNet encoder config (reference src/networks/torch/pointnet.py)."""
    tnet: bool = True
    max_points: int = 2048


@dataclass
class DGCNNRepresentation(Repr):
    """DGCNN config (reference src/networks/torch/dgcnn2d.py:79-178)."""
    k: int = 20
    emb_dims: int = 1024
    max_points: int = 2048
    dropout: float = 0.5


@dataclass
class MLPHead:
    layers: Tuple[int, ...] = ()
    hidden: int = 256
    dropout: float = 0.5


@dataclass
class SparseEventIDConfig:
    run: Run = field(default_factory=Run)
    mode: Mode = field(default_factory=Train)
    data: Data = field(default_factory=Data)
    framework: Framework = field(default_factory=Framework)
    encoder: Repr = field(default_factory=ConvRepresentation)
    head: MLPHead = field(default_factory=MLPHead)
    output_dir: str = "output/"
    name: str = "supervised_eventID"


# ---- group registries (the ConfigStore equivalent) ---------------------------

MODE_GROUP = {"train": Train, "inference": Inference, "iotest": IOTest,
              "visualize": Visualize}

ENCODER_GROUP = {
    "convnet": ConvRepresentation,
    "pointnet": PointNetRepresentation,
    "dgcnn": DGCNNRepresentation,
}

LR_SCHEDULE_GROUP = {
    "flat": FlatLRConfig,
    "one_cycle": OneCycleConfig,
    "standard": WarmupFlatDecayConfig,
}


def _dune_meta():
    # Hard-coded detector metadata, mirroring larcv_fetcher.meta
    # (/root/reference/src/io/larcv_fetcher.py:16-57).
    return {
        Detector.dune2d: dict(
            n_planes=3,
            image_size=(3, 1536, 1024),  # plane axis first (resnet.py:26-36)
            spatial=(1536, 1024),
        ),
        Detector.dune3d: dict(
            n_planes=1,
            image_size=(1024, 512, 1280),
            spatial=(1024, 512, 1280),
            physical_size=(409.6, 204.8, 516.0),
            origin=(0.0, -100.0, 0.0),
        ),
        Detector.synthetic: dict(
            n_planes=1,
            image_size=(64, 64, 64),
            spatial=(64, 64, 64),
        ),
    }


DETECTOR_META = _dune_meta()


def data_group(name: str) -> Data:
    if name == "dune2d":
        return Data(
            name="dune2d", dimension=2, images=3, image_key="dunevoxels",
            detector=Detector.dune2d, max_voxels=20000,
        )
    if name == "dune3d":
        return Data(
            name="dune3d", dimension=3, images=1, image_key="dunevoxels",
            detector=Detector.dune3d, max_voxels=50000,
        )
    if name == "synthetic":
        return Data(
            name="synthetic", dimension=3, images=1, image_key="dunevoxels",
            detector=Detector.synthetic, max_voxels=2048,
        )
    raise KeyError(f"unknown data group {name!r}")


DATA_GROUP = {"dune2d": None, "dune3d": None, "synthetic": None}  # via data_group()


# The 4 classification targets (supervised_eventID.py:224-229)
OUTPUT_SHAPE = {
    "labelneutID": 3,
    "labelprotID": 3,
    "labelnpiID": 2,
    "labelcpiID": 2,
}


def image_size(cfg: SparseEventIDConfig) -> Tuple[int, ...]:
    if cfg.data.detector == Detector.synthetic and cfg.data.dimension == 2:
        # 2D multiplane synthetic: plane axis first (resnet.py:26-36 trick)
        return (3, 64, 64)
    return tuple(DETECTOR_META[cfg.data.detector]["image_size"])


def sparse_capacity(cfg: SparseEventIDConfig) -> int:
    """Level-0 sparse row capacity: MaxVoxels, times the plane count for 2D
    multiplane data (the plane-axis SparseTensor concatenates all planes —
    data_transforms.py:198-252 packs [planes, MaxVoxels] per event)."""
    n = cfg.data.max_voxels
    if cfg.data.dimension == 2:
        n *= image_size(cfg)[0]
    return n

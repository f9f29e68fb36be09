"""Import the reference's torch model files with detectron2/timm stubbed.

The reference model code only needs a handful of symbols from detectron2 /
timm (registries, @configurable, DropPath, trunc_normal_tf_); stubbing them
lets us import the real `kmax_pixel_decoder.py` / `kmax_transformer_decoder.py`
read-only as numerical oracles.
"""
import importlib.util
import sys
import types

import torch


def _install_stubs():
    if "detectron2" in sys.modules and getattr(
        sys.modules["detectron2"], "__axialvs_stub__", False
    ):
        return

    class DropPath(torch.nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()

        def forward(self, x):
            return x

    def trunc_normal_tf_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_()
            tensor.clamp_(a, b)
            tensor.mul_(std).add_(mean)
        return tensor

    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")
    timm_layers.DropPath = DropPath
    timm_layers.trunc_normal_tf_ = trunc_normal_tf_
    timm_layers.trunc_normal_ = lambda t, mean=0.0, std=1.0, a=-2.0, b=2.0: (
        torch.nn.init.trunc_normal_(t, mean, std, a, b))
    timm_layers.to_2tuple = lambda v: v if isinstance(v, tuple) else (v, v)
    timm.models = timm_models
    timm_models.layers = timm_layers
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = timm_models
    sys.modules["timm.models.layers"] = timm_layers

    def configurable(init=None, *, from_config=None):
        if init is None:
            return lambda f: f
        return init

    class _Registry:
        def __init__(self, *a, **k):
            self.__doc__ = ""

        def register(self, obj=None):
            if obj is None:
                return lambda x: x
            return obj

        def get(self, name):
            raise KeyError(name)

    d2 = types.ModuleType("detectron2")
    d2.__axialvs_stub__ = True
    d2_config = types.ModuleType("detectron2.config")
    d2_config.configurable = configurable
    d2_layers = types.ModuleType("detectron2.layers")

    class ShapeSpec:
        def __init__(self, channels=0, stride=1):
            self.channels = channels
            self.stride = stride

    d2_layers.ShapeSpec = ShapeSpec
    d2_modeling = types.ModuleType("detectron2.modeling")
    d2_modeling.SEM_SEG_HEADS_REGISTRY = _Registry()
    d2_modeling.BACKBONE_REGISTRY = _Registry()
    d2_modeling.Backbone = torch.nn.Module
    d2_modeling.ShapeSpec = ShapeSpec
    d2_utils = types.ModuleType("detectron2.utils")
    d2_utils_registry = types.ModuleType("detectron2.utils.registry")
    d2_utils_registry.Registry = _Registry
    d2_utils.registry = d2_utils_registry
    for name, mod in {
        "detectron2": d2,
        "detectron2.config": d2_config,
        "detectron2.layers": d2_layers,
        "detectron2.modeling": d2_modeling,
        "detectron2.utils": d2_utils,
        "detectron2.utils.registry": d2_utils_registry,
    }.items():
        sys.modules[name] = mod


def _load(name, path, package=None):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    if package:
        mod.__package__ = package
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


_ROOT = "/root/reference/MaXTron_Video-kMaX"


def load_kmax_pixel_decoder():
    """Returns the reference kmax_pixel_decoder module (torch)."""
    _install_stubs()
    # build the package skeleton so `..backbone.convnext` resolves
    for pkg_name in ("kmax_ref", "kmax_ref.backbone", "kmax_ref.pixel_decoder",
                     "kmax_ref.transformer_decoder"):
        if pkg_name not in sys.modules:
            pkg = types.ModuleType(pkg_name)
            pkg.__path__ = []
            sys.modules[pkg_name] = pkg
    _load(
        "kmax_ref.backbone.convnext",
        f"{_ROOT}/kmax_deeplab/modeling/backbone/convnext.py",
        package="kmax_ref.backbone",
    )
    return _load(
        "kmax_ref.pixel_decoder.kmax_pixel_decoder",
        f"{_ROOT}/kmax_deeplab/modeling/pixel_decoder/kmax_pixel_decoder.py",
        package="kmax_ref.pixel_decoder",
    )


def load_kmax_transformer_decoder():
    load_kmax_pixel_decoder()
    return _load(
        "kmax_ref.transformer_decoder.kmax_transformer_decoder",
        f"{_ROOT}/kmax_deeplab/modeling/transformer_decoder/kmax_transformer_decoder.py",
        package="kmax_ref.transformer_decoder",
    )


def load_maxtron_transformer_decoder():
    """Load the reference video transformer decoder (clip-folding k-means
    decoder, `maxtron_transformer_decoder.py`)."""
    px = load_kmax_pixel_decoder()
    sys.modules["kmax_deeplab"] = types.ModuleType("kmax_deeplab")
    sys.modules["kmax_deeplab.modeling"] = types.ModuleType("kmax_deeplab.modeling")
    sys.modules["kmax_deeplab.modeling.pixel_decoder"] = types.ModuleType(
        "kmax_deeplab.modeling.pixel_decoder"
    )
    sys.modules["kmax_deeplab.modeling.pixel_decoder.kmax_pixel_decoder"] = px
    td = load_kmax_transformer_decoder()
    sys.modules["kmax_deeplab.modeling.transformer_decoder"] = types.ModuleType(
        "kmax_deeplab.modeling.transformer_decoder"
    )
    sys.modules["kmax_deeplab.modeling.transformer_decoder.kmax_transformer_decoder"] = td
    return _load(
        "maxtron_ref.maxtron_transformer_decoder",
        f"{_ROOT}/maxtron_deeplab/modeling/transformer_decoder/"
        "maxtron_transformer_decoder.py",
    )


def load_cc_module():
    """Load the reference cross-clip tracking module. Its absolute imports
    (kmax_deeplab..., maxtron_deeplab...) are aliased onto the shim-loaded
    modules."""
    px = load_kmax_pixel_decoder()
    sys.modules["kmax_deeplab"] = types.ModuleType("kmax_deeplab")
    sys.modules["kmax_deeplab.modeling"] = types.ModuleType("kmax_deeplab.modeling")
    sys.modules["kmax_deeplab.modeling.pixel_decoder"] = types.ModuleType(
        "kmax_deeplab.modeling.pixel_decoder"
    )
    sys.modules["kmax_deeplab.modeling.pixel_decoder.kmax_pixel_decoder"] = px

    import einops  # noqa: F401  (required by the reference module)

    td = load_kmax_transformer_decoder()
    mx = types.ModuleType(
        "maxtron_deeplab.modeling.transformer_decoder.maxtron_transformer_decoder"
    )
    mx.add_bias_towards_void = td.add_bias_towards_void
    for name in (
        "maxtron_deeplab",
        "maxtron_deeplab.modeling",
        "maxtron_deeplab.modeling.transformer_decoder",
    ):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules[
        "maxtron_deeplab.modeling.transformer_decoder.maxtron_transformer_decoder"
    ] = mx
    return _load(
        "cc_ref.maxtron_cross_clip_tracking_module",
        f"{_ROOT}/maxtron_deeplab/modeling/cross_clip_tracking_module/"
        "maxtron_cross_clip_tracking_module.py",
    )


def load_wc_msdeformattn():
    """Load the reference within-clip module (msdeformattn.py). The compiled
    CUDA extension is stubbed with a raiser so MSDeformAttn falls back to its
    pure-pytorch path (`ms_deform_attn.py:116-121`)."""
    _install_stubs()
    cuda_stub = types.ModuleType("MultiScaleDeformableAttention")

    def _raise(*a, **k):
        raise RuntimeError("CUDA op not available (test stub)")

    cuda_stub.ms_deform_attn_forward = _raise
    cuda_stub.ms_deform_attn_backward = _raise
    sys.modules["MultiScaleDeformableAttention"] = cuda_stub

    wc_root = f"{_ROOT}/maxtron_deeplab/modeling/within_clip_tracking_module"
    for pkg_name in ("wc_ref", "wc_ref.ops", "wc_ref.ops.functions",
                     "wc_ref.ops.modules"):
        if pkg_name not in sys.modules:
            pkg = types.ModuleType(pkg_name)
            pkg.__path__ = []
            sys.modules[pkg_name] = pkg
    _load("wc_ref.pos_embeddings", f"{wc_root}/pos_embeddings.py", package="wc_ref")
    _load("wc_ref.temporal_attention", f"{wc_root}/temporal_attention.py",
          package="wc_ref")
    func_mod = _load(
        "wc_ref.ops.functions.ms_deform_attn_func",
        f"{wc_root}/ops/functions/ms_deform_attn_func.py",
        package="wc_ref.ops.functions",
    )
    sys.modules["wc_ref.ops.functions"].MSDeformAttnFunction = (
        func_mod.MSDeformAttnFunction
    )
    mod_mod = _load(
        "wc_ref.ops.modules.ms_deform_attn",
        f"{wc_root}/ops/modules/ms_deform_attn.py",
        package="wc_ref.ops.modules",
    )
    sys.modules["wc_ref.ops.modules"].MSDeformAttn = mod_mod.MSDeformAttn
    return _load("wc_ref.msdeformattn", f"{wc_root}/msdeformattn.py",
                 package="wc_ref")


def load_tube_link_stdc():
    """Reference STDC backbone module (torch), with an mmdet-builder stub."""
    pkg = types.ModuleType("refmm")
    pkg.__path__ = []
    models = types.ModuleType("refmm.models")
    models.__path__ = []
    builder = types.ModuleType("refmm.models.builder")

    class _Reg:
        def register_module(self, *a, **k):
            def deco(c):
                return c
            return deco

    builder.BACKBONES = _Reg()
    backbones = types.ModuleType("refmm.models.backbones")
    backbones.__path__ = []
    for name, mod in {
        "refmm": pkg,
        "refmm.models": models,
        "refmm.models.builder": builder,
        "refmm.models.backbones": backbones,
    }.items():
        sys.modules[name] = mod
    return _load(
        "refmm.models.backbones.stdc",
        "/root/reference/MaXTron_Tube-Link/mmdet/models/backbones/stdc.py",
        package="refmm.models.backbones",
    )


def load_kmax_swin():
    """Reference Swin backbone module (torch, kmax d2 variant)."""
    _install_stubs()
    return _load("ref_kmax_swin", f"{_ROOT}/kmax_deeplab/modeling/backbone/swin.py")


def load_vitae_vsa():
    """Reference ViTAEv2-VSA backbone module (torch), with mmdet stubbed."""
    _install_stubs()
    base = "/root/reference/MaXTron_Tube-Link/mmdet/models/backbones"

    class _Reg:
        def register_module(self, *a, **k):
            def deco(c):
                return c
            return deco

    mods = {}
    for name in ("refvt", "refvt.models", "refvt.models.backbones",
                 "refvt.models.backbones.vitaev2_vsa_modules",
                 "mmdet_stub", "mmdet_stub.mmcv_custom", "mmdet_stub.utils"):
        pkg = types.ModuleType(name)
        pkg.__path__ = []
        mods[name] = pkg
    builder = types.ModuleType("refvt.models.builder")
    builder.BACKBONES = _Reg()
    mods["refvt.models.builder"] = builder
    mods["mmdet_stub.mmcv_custom"].load_checkpoint = lambda *a, **k: None
    mods["mmdet_stub.utils"].get_root_logger = lambda *a, **k: None
    # vitaev2_vsa.py imports `mmdet.mmcv_custom` / `mmdet.utils` absolutely
    mods["mmdet"] = mods["mmdet_stub"]
    mods["mmdet.mmcv_custom"] = mods["mmdet_stub.mmcv_custom"]
    mods["mmdet.utils"] = mods["mmdet_stub.utils"]
    sys.modules.update(mods)

    vm = "refvt.models.backbones.vitaev2_vsa_modules"
    for sub in ("window", "NormalCell", "token_performer",
                "token_transformer", "ReductionCell"):
        _load(f"{vm}.{sub}", f"{base}/vitaev2_vsa_modules/{sub}.py", package=vm)
    return _load("refvt.models.backbones.vitaev2_vsa", f"{base}/vitaev2_vsa.py",
                 package="refvt.models.backbones")


def load_raft():
    """Reference vendored RAFT core (torch), from scripts/test_vspw."""
    base = "/root/reference/MaXTron_Tube-Link/scripts/test_vspw/RAFT_core"
    for name in ("RAFT_core", "RAFT_core.utils"):
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = []
            sys.modules[name] = pkg
    _load("RAFT_core.utils.utils", f"{base}/utils/utils.py",
          package="RAFT_core.utils")
    for sub in ("corr", "extractor", "update"):
        _load(f"RAFT_core.{sub}", f"{base}/{sub}.py", package="RAFT_core")
    return _load("RAFT_core.raft", f"{base}/raft.py", package="RAFT_core")


def load_spatial_encoder():
    """Reference legacy spatial encoder (kmax_deeplab/modeling/
    spatial_encoder) with the CUDA MSDA extension stubbed to the pytorch
    fallback, plus the kMaXSpatialEncoder wrapper module."""
    _install_stubs()
    cuda_stub = types.ModuleType("MultiScaleDeformableAttention")

    def _raise(*a, **k):
        raise RuntimeError("CUDA op not available (test stub)")

    cuda_stub.ms_deform_attn_forward = _raise
    cuda_stub.ms_deform_attn_backward = _raise
    sys.modules["MultiScaleDeformableAttention"] = cuda_stub

    se_root = f"{_ROOT}/kmax_deeplab/modeling/spatial_encoder"
    for pkg_name in ("se_ref", "se_ref.ops", "se_ref.ops.functions",
                     "se_ref.ops.modules"):
        if pkg_name not in sys.modules:
            pkg = types.ModuleType(pkg_name)
            pkg.__path__ = []
            sys.modules[pkg_name] = pkg
    _load("se_ref.pos_embeddings", f"{se_root}/pos_embeddings.py", package="se_ref")
    _load("se_ref.temporal_attention", f"{se_root}/temporal_attention.py",
          package="se_ref")
    func_mod = _load(
        "se_ref.ops.functions.ms_deform_attn_func",
        f"{se_root}/ops/functions/ms_deform_attn_func.py",
        package="se_ref.ops.functions",
    )
    sys.modules["se_ref.ops.functions"].MSDeformAttnFunction = (
        func_mod.MSDeformAttnFunction
    )
    mod_mod = _load(
        "se_ref.ops.modules.ms_deform_attn",
        f"{se_root}/ops/modules/ms_deform_attn.py",
        package="se_ref.ops.modules",
    )
    sys.modules["se_ref.ops.modules"].MSDeformAttn = mod_mod.MSDeformAttn
    _load("se_ref.msdeformattn", f"{se_root}/msdeformattn.py", package="se_ref")
    return _load("se_ref.kmax_spatial_encoder",
                 f"{se_root}/kmax_spatial_encoder.py", package="se_ref")


def load_qdtrack_trackers():
    """Reference TaoTracker + IDOL_Tracker (torch), with mmcv/cv2/seaborn
    visualization deps stubbed (only used by the analysis tail)."""
    import numpy as _np

    def _bbox_overlaps(b1, b2):
        lt = torch.max(b1[:, None, :2], b2[None, :, :2])
        rb = torch.min(b1[:, None, 2:4], b2[None, :, 2:4])
        wh = (rb - lt).clamp(min=0)
        inter = wh[..., 0] * wh[..., 1]
        a1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
        a2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
        return inter / (a1[:, None] + a2[None, :] - inter).clamp(min=1e-6)

    import importlib.util

    # Stub ONLY genuinely-absent modules: overwriting a real, importable
    # module (cv2!) leaks into later tests in the same process and makes
    # the suite order-dependent (ADVICE round 1).
    stubs = {}
    for name in ("cv2", "seaborn", "mmcv", "mmcv.image", "mmcv.visualization"):
        if name in sys.modules:
            continue
        try:
            if importlib.util.find_spec(name) is not None:
                continue
        except (ImportError, ValueError):
            pass
        stubs[name] = types.ModuleType(name)
    mmdet_core = types.ModuleType("mmdet.core")
    mmdet_core.bbox_overlaps = _bbox_overlaps
    if "mmdet" not in sys.modules:
        mmdet_pkg = types.ModuleType("mmdet")
        mmdet_pkg.__path__ = []
        stubs["mmdet"] = mmdet_pkg
    stubs["mmdet.core"] = mmdet_core

    class _Reg:
        def register_module(self, *a, **k):
            def deco(c):
                return c
            return deco

    for name in ("reftrk", "reftrk.qdtrack", "reftrk.qdtrack.trackers",
                 "reftrk.qdtrack.track", "tracker", "tracker.qdtrack",
                 "tracker.qdtrack.track"):
        pkg = types.ModuleType(name)
        pkg.__path__ = []
        stubs[name] = pkg
    builder = types.ModuleType("reftrk.qdtrack.builder")
    builder.TRACKERS = _Reg()
    stubs["reftrk.qdtrack.builder"] = builder
    sys.modules.update(stubs)
    # Normalize attributes on the EFFECTIVE mmcv stubs regardless of who
    # created them: another loader (e.g. load_maskformer_fusion_head) may
    # have left a bare ``mmcv`` module earlier in the process, in which
    # case the submodules above were created here but the old
    # only-when-we-made-mmcv wiring skipped them — tao_tracker's
    # ``from mmcv.image import imread`` then failed whenever
    # test_vps_fusion ran before test_trackers_qdtrack (order-dependent
    # full-suite failure, round 2).
    mm = sys.modules.get("mmcv")
    mi = sys.modules.get("mmcv.image")
    mv = sys.modules.get("mmcv.visualization")
    if mi is not None and not hasattr(mi, "imread"):
        mi.imread = lambda *a, **k: None
        mi.imwrite = lambda *a, **k: None
    if mv is not None and not hasattr(mv, "color_val"):
        mv.color_val = lambda *a, **k: (0, 0, 0)
        mv.imshow = lambda *a, **k: None
    if mm is not None:
        if mi is not None and not hasattr(mm, "image"):
            mm.image = mi
        if mv is not None and not hasattr(mm, "visualization"):
            mm.visualization = mv
        if not hasattr(mm, "color_val"):
            mm.color_val = lambda *a, **k: (0, 0, 0)

    base = "/root/reference/MaXTron_Tube-Link/tracker/qdtrack"
    sim = _load("tracker.qdtrack.track.similarity", f"{base}/track/similarity.py",
                package="tracker.qdtrack.track")
    sys.modules["reftrk.qdtrack.track.similarity"] = sim
    tao = _load("reftrk.qdtrack.trackers.tao_tracker",
                f"{base}/trackers/tao_tracker.py",
                package="reftrk.qdtrack.trackers")
    idol = _load("reftrk.qdtrack.trackers.idol_tracker",
                 f"{base}/trackers/idol_tracker.py",
                 package="reftrk.qdtrack.trackers")
    return tao, idol


def load_unitrack():
    """Reference unitrack stack (torch) with lap / cython_bbox / cv2 /
    appearance-model deps stubbed. Returns (basetrack, matching,
    multitracker, kalman) modules."""
    import numpy as _np
    from scipy.optimize import linear_sum_assignment as _lsa

    def _lapjv(cost, extend_cost=True, cost_limit=_np.inf, return_cost=True):
        m, n = cost.shape
        big = cost_limit / 2.0 if _np.isfinite(cost_limit) else 1e9
        aug = _np.zeros((m + n, n + m))
        aug[:m, :n] = cost
        aug[:m, n:] = 1e18
        aug[m:, :n] = 1e18
        _np.fill_diagonal(aug[:m, n:], big)
        _np.fill_diagonal(aug[m:, :n], big)
        rows, cols = _lsa(aug)
        x = _np.full(m, -1, _np.int64)
        y = _np.full(n, -1, _np.int64)
        total = 0.0
        for r, c in zip(rows, cols):
            if r < m and c < n:
                x[r] = c
                y[c] = r
                total += cost[r, c]
        return total, x, y

    def _bbox_ious(a, b):
        iw = (_np.minimum(a[:, None, 2], b[None, :, 2])
              - _np.maximum(a[:, None, 0], b[None, :, 0]) + 1)
        ih = (_np.minimum(a[:, None, 3], b[None, :, 3])
              - _np.maximum(a[:, None, 1], b[None, :, 1]) + 1)
        inter = _np.clip(iw, 0, None) * _np.clip(ih, 0, None)
        inter[(iw <= 0) | (ih <= 0)] = 0.0
        area_a = (a[:, 2] - a[:, 0] + 1) * (a[:, 3] - a[:, 1] + 1)
        area_b = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
        return inter / (area_a[:, None] + area_b[None, :] - inter)

    # the reference predates numpy 2.x (np.float alias removed)
    if not hasattr(_np, "float"):
        _np.float = float

    lap_stub = types.ModuleType("lap")
    lap_stub.lapjv = _lapjv
    cb_stub = types.ModuleType("cython_bbox")
    cb_stub.bbox_overlaps = _bbox_ious
    tv_stub = types.ModuleType("torchvision")
    tv_ops = types.ModuleType("torchvision.ops")
    tv_ops.roi_align = lambda *a, **k: None
    tv_stub.ops = tv_ops
    stubs = {"lap": lap_stub, "cython_bbox": cb_stub,
             "torchvision": tv_stub, "torchvision.ops": tv_ops}
    if "cv2" not in sys.modules:
        stubs["cv2"] = types.ModuleType("cv2")

    for name in ("tracker", "tracker.unitrack", "tracker.unitrack.core",
                 "tracker.unitrack.core.motion",
                 "tracker.unitrack.core.association",
                 "tracker.unitrack.core.propagation",
                 "tracker.unitrack.utils", "tracker.unitrack.model"):
        if name not in sys.modules and name not in stubs:
            pkg = types.ModuleType(name)
            pkg.__path__ = []
            stubs[name] = pkg
    sys.modules.update(stubs)

    base = "/root/reference/MaXTron_Tube-Link/tracker/unitrack"
    kalman = _load("tracker.unitrack.core.motion.kalman_filter",
                   f"{base}/core/motion/kalman_filter.py",
                   package="tracker.unitrack.core.motion")
    sys.modules["tracker.unitrack.core.motion"].kalman_filter = kalman
    box_utils = _load("tracker.unitrack.utils.box", f"{base}/utils/box.py",
                      package="tracker.unitrack.utils")
    mask_utils = types.ModuleType("tracker.unitrack.utils.mask")
    sys.modules["tracker.unitrack.utils.mask"] = mask_utils
    log_stub = types.ModuleType("tracker.unitrack.utils.log")
    import logging
    log_stub.logger = logging.getLogger("unitrack-test")
    sys.modules["tracker.unitrack.utils.log"] = log_stub
    class _AppModel:
        def __init__(self, opt):
            pass

        def to(self, device):
            return self

        def eval(self):
            return self

    sys.modules["tracker.unitrack.model"].AppearanceModel = _AppModel
    sys.modules["tracker.unitrack.model"].partial_load = lambda *a, **k: None
    prop = sys.modules["tracker.unitrack.core.propagation"]
    prop.propagate = lambda *a, **k: None
    sys.modules["tracker.unitrack.core"].association = sys.modules[
        "tracker.unitrack.core.association"]
    matching = _load("tracker.unitrack.core.association.matching",
                     f"{base}/core/association/matching.py",
                     package="tracker.unitrack.core.association")
    sys.modules["tracker.unitrack.core.association"].matching = matching
    basetrack = _load("tracker.unitrack.basetrack", f"{base}/basetrack.py",
                      package="tracker.unitrack")
    sys.modules["tracker.unitrack"].basetrack = basetrack
    multitracker = _load("tracker.unitrack.multitracker",
                         f"{base}/multitracker.py", package="tracker.unitrack")
    return basetrack, matching, multitracker, kalman


def load_maskformer_fusion_head():
    """Reference MaskFormerFusionHead (torch) with mmcv/mmdet runtime
    stubbed — oracle for the panoptic_mode query variants (T2)."""
    _install_stubs()

    class BaseModule(torch.nn.Module):
        def __init__(self, init_cfg=None):
            super().__init__()

    if "mmcv" not in sys.modules:
        sys.modules["mmcv"] = types.ModuleType("mmcv")
    runner = types.ModuleType("mmcv.runner")
    runner.BaseModule = BaseModule
    sys.modules["mmcv.runner"] = runner
    sys.modules["mmcv"].runner = runner

    class _Reg:
        def register_module(self, *a, **k):
            def deco(c):
                return c
            return deco

    for name in ("mmdet", "mmdet.core", "mmdet.core.evaluation",
                 "mmdet.core.mask", "mmdet.models", "mmdet.models.builder",
                 "mmdet.core.evaluation.panoptic_utils", "fusion_ref"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__path__ = []
            sys.modules[name] = mod
    sys.modules["mmdet.core.evaluation.panoptic_utils"].INSTANCE_OFFSET = 1000
    sys.modules["mmdet.core.mask"].mask2bbox = lambda m: torch.zeros(
        (len(m), 4))
    sys.modules["mmdet.models.builder"].HEADS = _Reg()
    sys.modules["mmdet.models.builder"].build_loss = lambda cfg: None

    # package skeleton deep enough for the `from ...builder import` relative
    for name in ("fr", "fr.models", "fr.models.seg_heads",
                 "fr.models.seg_heads.panoptic_fusion_heads"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__path__ = []
            sys.modules[name] = mod
    builder = types.ModuleType("fr.models.builder")
    builder.build_loss = lambda cfg: None
    sys.modules["fr.models.builder"] = builder
    sys.modules["fr.models"].builder = builder

    base_dir = ("/root/reference/MaXTron_Tube-Link/mmdet/models/seg_heads/"
                "panoptic_fusion_heads")
    pkg = "fr.models.seg_heads.panoptic_fusion_heads"
    base = _load(f"{pkg}.base_panoptic_fusion_head",
                 f"{base_dir}/base_panoptic_fusion_head.py", package=pkg)
    sys.modules[pkg].base_panoptic_fusion_head = base
    return _load(f"{pkg}.maskformer_fusion_head",
                 f"{base_dir}/maskformer_fusion_head.py", package=pkg)


def load_ytvis_devkit():
    """Reference YTVIS api + YTVISeval. pycocotools is absent in this image,
    so a stub backed by axial_vs_tpu.data.mask_rle provides the mask ops the
    devkit uses (area/merge/decode/encode/toBbox).
    Returns (ytvis_module, ytviseval_module)."""
    import numpy as _np

    if not hasattr(_np, "float"):  # the devkit predates numpy 2.x
        _np.float = float

    if "pycocotools" not in sys.modules:
        import importlib.util as _ilu
        if _ilu.find_spec("pycocotools") is None:
            sys.path.insert(0, "/root/repo")
            from axial_vs_tpu.data import mask_rle as _mr

            mask = types.ModuleType("pycocotools.mask")

            def _merge(rles, intersect=False):
                ms = [_mr.decode(r).astype(bool) for r in rles]
                out = ms[0]
                for m in ms[1:]:
                    out = (out & m) if intersect else (out | m)
                return _mr.encode(out.astype(_np.uint8))

            def _to_bbox(rle):
                m = _mr.decode(rle)
                ys, xs = _np.nonzero(m)
                if not len(ys):
                    return _np.zeros(4)
                return _np.array([xs.min(), ys.min(),
                                  xs.max() - xs.min() + 1,
                                  ys.max() - ys.min() + 1], _np.float64)

            mask.area = lambda rle: float(_mr.area(rle))
            mask.merge = _merge
            mask.decode = _mr.decode
            mask.encode = lambda m: _mr.encode(_np.asarray(m, _np.uint8))
            mask.toBbox = _to_bbox

            def _frPyObjects(*a, **k):
                raise NotImplementedError("polygon inputs not supported")

            mask.frPyObjects = _frPyObjects
            pkg = types.ModuleType("pycocotools")
            pkg.mask = mask
            sys.modules["pycocotools"] = pkg
            sys.modules["pycocotools.mask"] = mask
    base = "/root/reference/MaXTron_Tube-Link/datasets/datasets/core"
    api = _load("ytvis_ref.ytvis", f"{base}/ytvis.py", package="ytvis_ref")
    ev = _load("ytvis_ref.ytviseval", f"{base}/ytviseval.py",
               package="ytvis_ref")
    return api, ev


def load_wc_criterion():
    """Reference MaXTronWCSetCriterion + VideoHungarianMatcher
    (`maxtron_deeplab/modeling/{wc_criterion,matcher}.py`). torchvision is
    absent in this image; its only use is ``box_area`` (imported, unused on
    the video path) — stubbed."""
    import types

    if "torchvision" not in sys.modules:
        import importlib.util as _ilu
        if _ilu.find_spec("torchvision") is None:
            import torch as _torch

            boxes = types.ModuleType("torchvision.ops.boxes")

            def _box_area(b):
                return (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])

            boxes.box_area = _box_area
            ops = types.ModuleType("torchvision.ops")
            ops.boxes = boxes
            tv = types.ModuleType("torchvision")
            tv.ops = ops
            sys.modules["torchvision"] = tv
            sys.modules["torchvision.ops"] = ops
            sys.modules["torchvision.ops.boxes"] = boxes
    base = "/root/reference/MaXTron_Video-kMaX/maxtron_deeplab/modeling"
    matcher = _load("maxtron_ref.matcher", f"{base}/matcher.py",
                    package="maxtron_ref")
    crit = _load("maxtron_ref.wc_criterion", f"{base}/wc_criterion.py",
                 package="maxtron_ref")
    return crit, matcher


def load_tube_link_pixel_decoder():
    """The reference's REAL ``MSDeformAttnPixelDecoder`` with fused
    MSDA + axial-trajectory attention (`MaXTron_Tube-Link/mmdet/models/
    plugins/msdeformattn_pixel_decoder.py` — decoder wiring :31-327, fused
    attention :394-660, trajectory/temporal layers :652-800), loaded
    read-only with the absent mmcv/mmengine runtime substituted by minimal
    faithful bricks (BaseTransformerLayer with the config's
    ('self_attn','norm','ffn','norm') order, SinePositionalEncoding,
    ConvModule, MlvlPointGenerator, and the pure-torch grid_sample MSDA
    fallback that mmcv ships for CPU). Returns the loaded module."""
    import math
    import types

    import torch.nn as nn
    import torch.nn.functional as F

    name = "tube_ref.msdeformattn_pixel_decoder"
    if name in sys.modules:
        return sys.modules[name]

    _install_stubs()

    registered = {}

    class _Reg:
        def register_module(self, *a, **k):
            def deco(c):
                registered[c.__name__] = c
                return c
            return deco

    class AttrDict(dict):
        __getattr__ = dict.__getitem__

        def __setattr__(self, k, v):
            self[k] = v

    def _wrap(cfg):
        if isinstance(cfg, dict) and not isinstance(cfg, AttrDict):
            return AttrDict({k: _wrap(v) for k, v in cfg.items()})
        return cfg

    class BaseModule(nn.Module):
        def __init__(self, init_cfg=None):
            super().__init__()

        def init_weights(self):
            pass

    class ConvModule(nn.Module):
        """conv -> (GN) -> (ReLU), matching the only configs this file
        builds: norm_cfg GN(32) or None, act_cfg ReLU or None."""

        def __init__(self, cin, cout, kernel_size, stride=1, padding=0,
                     bias="auto", norm_cfg=None, act_cfg=None):
            super().__init__()
            use_bias = bias if isinstance(bias, bool) else norm_cfg is None
            self.conv = nn.Conv2d(cin, cout, kernel_size, stride, padding,
                                  bias=use_bias)
            self.gn = (nn.GroupNorm(norm_cfg["num_groups"], cout)
                       if norm_cfg else None)
            self.act = nn.ReLU(inplace=True) if act_cfg else None

        def forward(self, x):
            x = self.conv(x)
            if self.gn is not None:
                x = self.gn(x)
            if self.act is not None:
                x = self.act(x)
            return x

    class SinePositionalEncoding(nn.Module):
        """mmcv SinePositionalEncoding(num_feats, normalize=True): input a
        (B, H, W) padding mask, output (B, 2*num_feats, H, W)."""

        def __init__(self, num_feats=128, temperature=10000, normalize=True,
                     scale=2 * math.pi, eps=1e-6):
            super().__init__()
            self.num_feats = num_feats
            self.temperature = temperature
            self.normalize = normalize
            self.scale = scale
            self.eps = eps

        def forward(self, mask):
            not_mask = (~mask).to(torch.float32)
            y = not_mask.cumsum(1)
            x = not_mask.cumsum(2)
            if self.normalize:
                y = y / (y[:, -1:, :] + self.eps) * self.scale
                x = x / (x[:, :, -1:] + self.eps) * self.scale
            dim_t = torch.arange(self.num_feats, dtype=torch.float32)
            dim_t = self.temperature ** (
                2 * torch.div(dim_t, 2, rounding_mode="floor")
                / self.num_feats)
            px = x[:, :, :, None] / dim_t
            py = y[:, :, :, None] / dim_t
            b, h, w = mask.shape
            px = torch.stack(
                (px[:, :, :, 0::2].sin(), px[:, :, :, 1::2].cos()),
                dim=4).view(b, h, w, -1)
            py = torch.stack(
                (py[:, :, :, 0::2].sin(), py[:, :, :, 1::2].cos()),
                dim=4).view(b, h, w, -1)
            return torch.cat((py, px), dim=3).permute(0, 3, 1, 2)

    class MlvlPointGenerator:
        """mmdet grid priors: (x + 0.5, y + 0.5) * stride per level."""

        def __init__(self, strides):
            self.strides = strides

        def single_level_grid_priors(self, featmap_size, level_idx,
                                     device=None):
            h, w = featmap_size
            stride = self.strides[level_idx]
            ys = (torch.arange(h, dtype=torch.float32, device=device)
                  + 0.5) * stride
            xs = (torch.arange(w, dtype=torch.float32, device=device)
                  + 0.5) * stride
            yy = ys[:, None].expand(h, w).reshape(-1)
            xx = xs[None, :].expand(h, w).reshape(-1)
            return torch.stack([xx, yy], dim=-1)

    class FFN(nn.Module):
        def __init__(self, dim, hidden, drop=0.0):
            super().__init__()
            self.fc1 = nn.Linear(dim, hidden)
            self.fc2 = nn.Linear(hidden, dim)

        def forward(self, x):
            return x + self.fc2(F.relu(self.fc1(x), inplace=True))

    class _EncoderLayer(nn.Module):
        """BaseTransformerLayer('self_attn', 'norm', 'ffn', 'norm') where
        self_attn is the registered attention class from the config."""

        def __init__(self, layer_cfg):
            super().__init__()
            attn_cfg = dict(layer_cfg["attn_cfgs"])
            cls = registered[attn_cfg.pop("type")]
            self.attn = cls(**attn_cfg)
            dim = self.attn.embed_dims
            self.norm1 = nn.LayerNorm(dim)
            self.ffn = FFN(dim, layer_cfg["feedforward_channels"])
            self.norm2 = nn.LayerNorm(dim)

        def forward(self, query, query_pos=None, query_pos3d=None, **kw):
            kw.pop("key", None), kw.pop("value", None)
            kw.pop("key_pos", None), kw.pop("attn_masks", None)
            kw.pop("key_padding_mask", None), kw.pop("valid_radios", None)
            mask = kw.pop("query_key_padding_mask", None)
            if query_pos3d is not None:
                kw["query_pos3d"] = query_pos3d
            x = self.attn(query=query, query_pos=query_pos,
                          key_padding_mask=mask, **kw)
            x = self.norm1(x)
            x = self.ffn(x)
            return self.norm2(x)

    class _EncoderSequence(nn.Module):
        def __init__(self, cfg):
            super().__init__()
            self.layers = nn.ModuleList(
                [_EncoderLayer(cfg["transformerlayers"])
                 for _ in range(cfg["num_layers"])])

        def forward(self, query, **kw):
            for layer in self.layers:
                query = layer(query, **kw)
            return query

    def build_transformer_layer_sequence(cfg):
        return _EncoderSequence(cfg)

    def build_positional_encoding(cfg):
        return SinePositionalEncoding(cfg["num_feats"],
                                      normalize=cfg["normalize"])

    def multi_scale_deformable_attn_pytorch(value, spatial_shapes,
                                            sampling_locations,
                                            attention_weights):
        """Pure-torch MSDA via grid_sample (bilinear, zeros, align_corners
        False) — identical formulation to tests/test_msda.py's oracle."""
        bs, _, m, d = value.shape
        _, lq, _, L, p, _ = sampling_locations.shape
        sizes = [int(h) * int(w) for h, w in spatial_shapes]
        per_level = value.split(sizes, dim=1)
        grids = 2 * sampling_locations - 1
        sampled = []
        for lvl, (h, w) in enumerate(spatial_shapes):
            v = (per_level[lvl].permute(0, 2, 3, 1)
                 .reshape(bs * m, d, int(h), int(w)))
            g = grids[:, :, :, lvl].permute(0, 2, 1, 3, 4).reshape(
                bs * m, lq, p, 2)
            sampled.append(F.grid_sample(
                v, g, mode="bilinear", padding_mode="zeros",
                align_corners=False))  # (bs*m, d, lq, p)
        samp = torch.stack(sampled, dim=-2).flatten(-2)  # (bs*m, d, lq, L*p)
        attn = attention_weights.permute(0, 2, 1, 3, 4).reshape(
            bs * m, 1, lq, L * p)
        out = (samp * attn).sum(-1)  # (bs*m, d, lq)
        return out.view(bs, m * d, lq).transpose(1, 2).contiguous()

    def xavier_init(module, gain=1, bias=0, distribution="normal"):
        if hasattr(module, "weight") and module.weight.dim() > 1:
            if distribution == "uniform":
                nn.init.xavier_uniform_(module.weight, gain=gain)
            else:
                nn.init.xavier_normal_(module.weight, gain=gain)
        if hasattr(module, "bias") and module.bias is not None:
            nn.init.constant_(module.bias, bias)

    def constant_init(module, val, bias=0):
        if hasattr(module, "weight") and module.weight is not None:
            nn.init.constant_(module.weight, val)
        if hasattr(module, "bias") and module.bias is not None:
            nn.init.constant_(module.bias, bias)

    def caffe2_xavier_init(module, bias=0):
        xavier_init(module, bias=bias)

    def normal_init(module, mean=0, std=1, bias=0):
        if hasattr(module, "weight") and module.weight is not None:
            nn.init.normal_(module.weight, mean, std)

    def deprecated_api_warning(name_dict, cls_name=None):
        def deco(fn):
            return fn
        return deco

    def _mod(name, **attrs):
        m = types.ModuleType(name)
        m.__path__ = []
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    mmcv = sys.modules.get("mmcv") or _mod("mmcv")
    _mod("mmcv.cnn", PLUGIN_LAYERS=_Reg(), Conv2d=nn.Conv2d,
         ConvModule=ConvModule, caffe2_xavier_init=caffe2_xavier_init,
         normal_init=normal_init, xavier_init=xavier_init)
    _mod("mmcv.cnn.bricks")
    _mod("mmcv.cnn.bricks.transformer",
         build_positional_encoding=build_positional_encoding,
         build_transformer_layer_sequence=build_transformer_layer_sequence)
    _mod("mmcv.cnn.bricks.registry", ATTENTION=_Reg())
    runner = sys.modules.get("mmcv.runner") or _mod("mmcv.runner")
    runner.BaseModule = getattr(runner, "BaseModule", BaseModule)
    runner.ModuleList = nn.ModuleList
    mmcv.runner = runner
    _mod("mmcv.utils", IS_CUDA_AVAILABLE=False, IS_MLU_AVAILABLE=False)
    _mod("mmcv.ops")
    _mod("mmcv.ops.multi_scale_deform_attn",
         MultiScaleDeformableAttnFunction=None,
         multi_scale_deformable_attn_pytorch=(
             multi_scale_deformable_attn_pytorch))

    class _MSDAPlaceholder(nn.Module):
        pass

    for n in ("mmdet", "mmdet.core", "mmdet.core.anchor", "mmdet.models",
              "mmdet.models.utils"):
        if n not in sys.modules:
            _mod(n)
    sys.modules["mmdet.core.anchor"].MlvlPointGenerator = MlvlPointGenerator
    _mod("mmdet.models.utils.transformer",
         MultiScaleDeformableAttention=_MSDAPlaceholder)

    mmengine = _mod("mmengine", ConfigDict=AttrDict)
    _mod("mmengine.model", constant_init=constant_init,
         xavier_init=xavier_init)

    class _ModelsReg(_Reg):
        pass

    _mod("mmengine.registry", MODELS=_ModelsReg())
    _mod("mmengine.utils", deprecated_api_warning=deprecated_api_warning)
    mmengine.ConfigDict = AttrDict

    mod = _load(
        name,
        "/root/reference/MaXTron_Tube-Link/mmdet/models/plugins/"
        "msdeformattn_pixel_decoder.py",
        package="tube_ref",
    )
    mod.__axialvs_wrap_cfg__ = _wrap
    return mod

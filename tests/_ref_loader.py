"""Load reference (PyTorch) modules from /root/reference for golden tests.

The reference depends on ``diffusers`` (not installed); we stub just the
mixins/utilities its model files touch. Reference code is executed only to
produce numerical ground truth for parity tests — never imported into the
framework itself.
"""

import dataclasses
import importlib.util
import sys
import types

REFERENCE_ROOT = "/root/reference"


def _install_diffusers_stub():
    if "diffusers" in sys.modules:
        return
    import torch

    diffusers = types.ModuleType("diffusers")

    cfg_utils = types.ModuleType("diffusers.configuration_utils")

    class ConfigMixin:
        pass

    def register_to_config(fn):
        return fn

    cfg_utils.ConfigMixin = ConfigMixin
    cfg_utils.register_to_config = register_to_config

    single_file = types.ModuleType("diffusers.loaders.single_file_model")

    class FromOriginalModelMixin:
        pass

    single_file.FromOriginalModelMixin = FromOriginalModelMixin
    loaders = types.ModuleType("diffusers.loaders")
    loaders.single_file_model = single_file

    vae_mod = types.ModuleType("diffusers.models.autoencoders.vae")

    @dataclasses.dataclass
    class DecoderOutput:
        sample: object

    class DiagonalGaussianDistribution:
        def __init__(self, parameters, deterministic=False):
            self.parameters = parameters
            self.mean, self.logvar = torch.chunk(parameters, 2, dim=1)
            self.logvar = torch.clamp(self.logvar, -30.0, 20.0)
            self.std = torch.exp(0.5 * self.logvar)

        def sample(self, generator=None):
            noise = torch.randn(self.mean.shape, generator=generator,
                                dtype=self.mean.dtype)
            return self.mean + self.std * noise

        def mode(self):
            return self.mean

    vae_mod.DecoderOutput = DecoderOutput
    vae_mod.DiagonalGaussianDistribution = DiagonalGaussianDistribution

    outputs_mod = types.ModuleType("diffusers.models.modeling_outputs")

    @dataclasses.dataclass
    class AutoencoderKLOutput:
        latent_dist: object

    outputs_mod.AutoencoderKLOutput = AutoencoderKLOutput

    modeling_utils = types.ModuleType("diffusers.models.modeling_utils")
    modeling_utils.ModelMixin = torch.nn.Module

    autoencoders = types.ModuleType("diffusers.models.autoencoders")
    autoencoders.vae = vae_mod
    models_mod = types.ModuleType("diffusers.models")
    models_mod.autoencoders = autoencoders
    models_mod.modeling_outputs = outputs_mod
    models_mod.modeling_utils = modeling_utils

    accel_utils = types.ModuleType("diffusers.utils.accelerate_utils")

    def apply_forward_hook(fn):
        return fn

    accel_utils.apply_forward_hook = apply_forward_hook
    utils_mod = types.ModuleType("diffusers.utils")
    utils_mod.accelerate_utils = accel_utils

    for name, mod in {
        "diffusers": diffusers,
        "diffusers.configuration_utils": cfg_utils,
        "diffusers.loaders": loaders,
        "diffusers.loaders.single_file_model": single_file,
        "diffusers.models": models_mod,
        "diffusers.models.autoencoders": autoencoders,
        "diffusers.models.autoencoders.vae": vae_mod,
        "diffusers.models.modeling_outputs": outputs_mod,
        "diffusers.models.modeling_utils": modeling_utils,
        "diffusers.utils": utils_mod,
        "diffusers.utils.accelerate_utils": accel_utils,
    }.items():
        sys.modules[name] = mod
    diffusers.configuration_utils = cfg_utils
    diffusers.loaders = loaders
    diffusers.models = models_mod
    diffusers.utils = utils_mod


def _install_scheduler_stubs():
    """Extra diffusers pieces used by the reference fm_solvers files."""
    import enum
    import functools
    import inspect

    import torch

    _install_diffusers_stub()
    if "diffusers.schedulers.scheduling_utils" in sys.modules:
        return

    sched_utils = types.ModuleType("diffusers.schedulers.scheduling_utils")

    class KarrasDiffusionSchedulers(enum.Enum):
        DDIMScheduler = 1

    class SchedulerMixin:
        def register_to_config(self, **kwargs):
            for k, v in kwargs.items():
                setattr(self.config, k, v)

    @dataclasses.dataclass
    class SchedulerOutput:
        prev_sample: object

    sched_utils.KarrasDiffusionSchedulers = KarrasDiffusionSchedulers
    sched_utils.SchedulerMixin = SchedulerMixin
    sched_utils.SchedulerOutput = SchedulerOutput

    schedulers = types.ModuleType("diffusers.schedulers")
    schedulers.scheduling_utils = sched_utils

    utils_mod = sys.modules["diffusers.utils"]

    def deprecate(*args, **kwargs):
        pass

    utils_mod.deprecate = deprecate
    utils_mod.is_scipy_available = lambda: False

    torch_utils = types.ModuleType("diffusers.utils.torch_utils")

    def randn_tensor(shape, generator=None, device=None, dtype=None):
        return torch.randn(shape, generator=generator, dtype=dtype)

    torch_utils.randn_tensor = randn_tensor
    utils_mod.torch_utils = torch_utils

    # a register_to_config that really captures the init args into .config
    cfg_utils = sys.modules["diffusers.configuration_utils"]

    def register_to_config(init):
        @functools.wraps(init)
        def wrapper(self, *args, **kwargs):
            sig = inspect.signature(init)
            bound = sig.bind(self, *args, **kwargs)
            bound.apply_defaults()
            cfg = {k: v for k, v in bound.arguments.items() if k != "self"}
            self.config = types.SimpleNamespace(**cfg)
            init(self, *args, **kwargs)
        return wrapper

    cfg_utils.register_to_config = register_to_config

    sys.modules["diffusers.schedulers"] = schedulers
    sys.modules["diffusers.schedulers.scheduling_utils"] = sched_utils
    sys.modules["diffusers.utils.torch_utils"] = torch_utils
    sys.modules["diffusers"].schedulers = schedulers


def load_reference_dit(which: str = "wan_transformer4d"):
    """Import the reference DiT with package context (it uses relative
    imports of ``..dist`` / ``..utils`` — the dist module is absent from the
    snapshot, SURVEY.md §2.4 — so both are stubbed)."""
    import logging as pylogging

    import torch

    _install_scheduler_stubs()
    utils_mod = sys.modules["diffusers.utils"]
    utils_mod.is_torch_version = lambda op, version: True

    logging_stub = types.ModuleType("diffusers.utils.logging")
    logging_stub.get_logger = pylogging.getLogger
    utils_mod.logging = logging_stub
    sys.modules["diffusers.utils.logging"] = logging_stub

    modeling_utils = sys.modules["diffusers.models.modeling_utils"]

    class ModelMixin(torch.nn.Module):
        _supports_gradient_checkpointing = False

    modeling_utils.ModelMixin = ModelMixin

    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        timm_models = types.ModuleType("timm.models")
        timm_layers = types.ModuleType("timm.models.layers")

        def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
            with torch.no_grad():
                tensor.normal_(mean, std).clamp_(a * std, b * std)
            return tensor

        class DropPath(torch.nn.Module):
            def __init__(self, drop_prob=0.0):
                super().__init__()

            def forward(self, x):
                return x

        timm_layers.trunc_normal_ = trunc_normal_
        timm_layers.DropPath = DropPath
        timm_models.layers = timm_layers
        timm.models = timm_models
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = timm_models
        sys.modules["timm.models.layers"] = timm_layers

    if "hydra" not in sys.modules:
        hydra = types.ModuleType("hydra")
        hydra_utils = types.ModuleType("hydra.utils")

        def instantiate(target, *a, **k):
            return target

        hydra_utils.instantiate = instantiate
        hydra.utils = hydra_utils
        sys.modules["hydra"] = hydra
        sys.modules["hydra.utils"] = hydra_utils

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")

        class _Identity:
            def __init__(self, *a, **k):
                pass

            def __call__(self, x):
                return x

        class _Compose:
            def __init__(self, transforms):
                self.transforms = transforms

            def __call__(self, x):
                for t in self.transforms:
                    x = t(x)
                return x

        class _Normalize:
            def __init__(self, mean, std):
                self.mean, self.std = mean, std

            def __call__(self, x):
                mean = torch.tensor(self.mean).view(-1, 1, 1)
                std = torch.tensor(self.std).view(-1, 1, 1)
                return (x - mean) / std

        class _InterpolationMode:
            BICUBIC = "bicubic"

        tvt.Compose = _Compose
        tvt.Resize = _Identity
        tvt.ToTensor = _Identity
        tvt.Normalize = _Normalize
        tvt.InterpolationMode = _InterpolationMode
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt

    pkg_name = "refMoRe4D"
    if f"{pkg_name}.models.{which}" in sys.modules:
        return sys.modules[f"{pkg_name}.models.{which}"]

    pkg = types.ModuleType(pkg_name)
    pkg.__path__ = []

    dist = types.ModuleType(f"{pkg_name}.dist")
    for n in ("get_sequence_parallel_rank", "get_sequence_parallel_world_size",
              "get_sp_group", "usp_attn_forward",
              "xFuserLongContextAttention"):
        setattr(dist, n, None)

    utils_pkg = types.ModuleType(f"{pkg_name}.utils")

    def cfg_skip():
        def deco(fn):
            return fn
        return deco

    utils_pkg.cfg_skip = cfg_skip

    models_pkg = types.ModuleType(f"{pkg_name}.models")
    models_pkg.__path__ = [f"{REFERENCE_ROOT}/MoRe4D/models"]

    sys.modules[pkg_name] = pkg
    sys.modules[f"{pkg_name}.dist"] = dist
    sys.modules[f"{pkg_name}.utils"] = utils_pkg
    sys.modules[f"{pkg_name}.models"] = models_pkg

    _fix_stub_specs()
    import importlib

    return importlib.import_module(f"{pkg_name}.models.{which}")


def _fix_stub_specs():
    """Give every injected stub a real ModuleSpec: importlib.util.find_spec
    (used by transformers' optional-dependency probing, e.g. for timm and
    torchvision) raises ``ValueError: <name>.__spec__ is None`` otherwise —
    which broke `from transformers import Dinov2Model` in any test run
    after a golden test had installed the stubs."""
    import importlib.machinery as mach

    roots = ("diffusers", "timm", "hydra", "torchvision", "refMoRe4D",
             "easydict", "xfuser")
    for name, mod in list(sys.modules.items()):
        if mod is None:
            continue
        if name.split(".")[0] in roots and \
                getattr(mod, "__spec__", "missing") is None:
            mod.__spec__ = mach.ModuleSpec(name, loader=None)


def load_reference_module(relpath: str, name: str):
    """Import a single reference file by path (no package context)."""
    _install_diffusers_stub()
    if "fm_solvers" in relpath:
        _install_scheduler_stubs()
    _fix_stub_specs()
    spec = importlib.util.spec_from_file_location(
        name, f"{REFERENCE_ROOT}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod

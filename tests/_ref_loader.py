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


def load_reference_module(relpath: str, name: str):
    """Import a single reference file by path (no package context)."""
    _install_diffusers_stub()
    spec = importlib.util.spec_from_file_location(
        name, f"{REFERENCE_ROOT}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod

"""Short import alias for the TPU-native colonoscopy 3D framework.

``import e3d_tpu`` (and any submodule, e.g. ``e3d_tpu.models.dpt``) resolves
to the *same module objects* as the canonical package
``enhanced_3d_reconstruction_in_colonoscopy_using_monocular_depth_and_pose_estimation_tpu``
via a meta-path finder, so there is never a duplicated module hierarchy.
"""

import importlib
import importlib.abc
import importlib.util
import sys

_ALIAS = "e3d_tpu"
_CANONICAL = (
    "enhanced_3d_reconstruction_in_colonoscopy_using_monocular_depth_"
    "and_pose_estimation_tpu"
)


class _AliasLoader(importlib.abc.Loader):
    def __init__(self, real_name: str):
        self._real_name = real_name
        self._orig_spec = None
        self._orig_package = None

    def create_module(self, spec):
        module = importlib.import_module(self._real_name)
        # The import machinery will overwrite __spec__/__package__ with the
        # alias spec; remember the canonical ones to restore (otherwise
        # later relative imports inside the module warn about
        # __package__ != __spec__.parent).
        self._orig_spec = module.__spec__
        self._orig_package = module.__package__
        return module

    def exec_module(self, module):  # already executed under canonical name
        if self._orig_spec is not None:
            module.__spec__ = self._orig_spec
            module.__package__ = self._orig_package


class _AliasFinder(importlib.abc.MetaPathFinder):
    def find_spec(self, name, path=None, target=None):
        if name != _ALIAS and not name.startswith(_ALIAS + "."):
            return None
        real_name = _CANONICAL + name[len(_ALIAS):]
        spec = importlib.util.spec_from_loader(name, _AliasLoader(real_name))
        real_spec = importlib.util.find_spec(real_name)
        if real_spec is not None and real_spec.submodule_search_locations:
            spec.submodule_search_locations = real_spec.submodule_search_locations
        return spec


if not any(isinstance(f, _AliasFinder) for f in sys.meta_path):
    sys.meta_path.insert(0, _AliasFinder())

# Make `import e3d_tpu` itself yield the canonical package object.
sys.modules[_ALIAS] = importlib.import_module(_CANONICAL)

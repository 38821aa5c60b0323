from .designer import HornInstance, MultiPatchScene, PatchInstance

__all__ = ["PatchInstance", "HornInstance", "MultiPatchScene"]

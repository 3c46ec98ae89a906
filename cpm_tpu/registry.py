"""Registries mapping config strings -> module constructors.

Same dispatch surface as the reference's `pet/rcnn/modeling/registry.py` (24
Registry instances; dict + decorator), rebuilt as a minimal generic class.
"""


class Registry(dict):
    """A dict that can also be used as a decorator: @REG.register("name")."""

    def __init__(self, name):
        super().__init__()
        self.name = name

    def register(self, key, module=None):
        if module is not None:
            self._do_register(key, module)
            return module

        def deco(fn):
            self._do_register(key, fn)
            return fn

        return deco

    def _do_register(self, key, module):
        if key in self:
            raise KeyError(f"{key} already registered in {self.name}")
        self[key] = module

    def get(self, key):
        if key not in self:
            raise KeyError(
                f"{key!r} not found in registry {self.name}; "
                f"available: {sorted(self.keys())}"
            )
        return self[key]


BACKBONES = Registry("BACKBONES")
FPN_BODY = Registry("FPN_BODY")

RPN_HEADS = Registry("RPN_HEADS")

ROI_BOX_HEADS = Registry("ROI_BOX_HEADS")
ROI_BOX_OUTPUTS = Registry("ROI_BOX_OUTPUTS")

ROI_CASCADE_HEADS = Registry("ROI_CASCADE_HEADS")
ROI_CASCADE_OUTPUTS = Registry("ROI_CASCADE_OUTPUTS")

ROI_GRID_HEADS = Registry("ROI_GRID_HEADS")
ROI_GRID_OUTPUTS = Registry("ROI_GRID_OUTPUTS")
ROI_CLS_HEADS = Registry("ROI_CLS_HEADS")
ROI_CLS_OUTPUTS = Registry("ROI_CLS_OUTPUTS")

"""numpy-backed tensor facade for the torch device idioms reference scripts
use on loader/model outputs (``.to(device)``, ``.cpu()``, ``.item()``, slice
views). A plain ``np.ndarray`` subclass: slicing and ufuncs preserve the
type, ``.item()`` comes from numpy itself."""

from __future__ import annotations

import numpy as np


class ArrayTensor(np.ndarray):
    """ndarray + no-op device methods (data already lives host-side; the
    jitted forward moves it to the TPU)."""

    def to(self, *args, **kwargs):
        return self

    def cpu(self):
        return self

    def cuda(self, *args, **kwargs):
        return self

    def detach(self):
        return self

    def numpy(self):
        return np.asarray(self)

    def float(self):
        return self.astype(np.float32).view(ArrayTensor)

    # NOTE: torch's ``.size(0)`` method is NOT shimmed — ``np.ndarray.size``
    # is a core attribute and shadowing it breaks numpy itself. The only
    # reference uses of ``.size(n)`` sit inside torch training loops, which
    # are the documented boundary (see package docstring).

    def unsqueeze(self, dim):
        return np.expand_dims(self, dim).view(ArrayTensor)

    def squeeze(self, dim=None):
        out = np.squeeze(self, axis=dim) if dim is not None else np.squeeze(self)
        return out.view(ArrayTensor)

    def permute(self, *dims):
        return np.transpose(self, dims).view(ArrayTensor)

    @property
    def device(self):  # pragma: no cover - cosmetic
        return "mvtb_tpu"


def as_tensor(x) -> ArrayTensor:
    return np.asarray(x).view(ArrayTensor)

"""Import the reference's deployed torch checkpoint for serving parity.

The reference trains ``SimpleModel`` — a single ``nn.Linear(6, 2)`` —
and serves ``argmax(softmax(W·x + b))`` from a saved ``state_dict``
(reference app.py:96-105 model class, app.py:130 ``torch.save``,
app.py:137-143 ``load_state_dict`` + eval). A user migrating the
deployed app brings ``loan_prediction_model.pth`` with them; this
module reads it WITHOUT torch (none in this environment) and folds the
two tensors into the exact params dict :func:`..ml.serving.predict_local`
already scores with.

Math: for a 2-class linear head, softmax class-1 probability equals
``sigmoid((w₁-w₀)·x + (b₁-b₀))`` — so the imported binary-logistic
coefficients are the row difference of ``fc.weight`` and the scalar
difference of ``fc.bias``, and ``predict_local``'s sigmoid path scores
identically to the torch forward + argmax.

File format (public: pytorch serialization docs / torch/serialization.py):
a zip archive holding ``<name>/data.pkl`` — a pickle whose tensors are
``torch._utils._rebuild_tensor_v2`` calls over persistent-id storage
references — plus one raw little-endian buffer per storage under
``<name>/data/<key>``. A ~60-line restricted unpickler reconstructs
the arrays with numpy; nothing outside this whitelist is executed.
"""

from __future__ import annotations

import pickle
import zipfile

import numpy as np

# torch storage class name -> numpy dtype
_STORAGE_DTYPES = {
    "FloatStorage": "f4",
    "DoubleStorage": "f8",
    "HalfStorage": "f2",
    "LongStorage": "i8",
    "IntStorage": "i4",
    "ShortStorage": "i2",
    "CharStorage": "i1",
    "ByteStorage": "u1",
    "BoolStorage": "b1",
}


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Read a ``torch.save(model.state_dict(), path)`` checkpoint into
    {param_name: ndarray} with no torch dependency.

    Only the serialization vocabulary torch itself emits is honored
    (OrderedDict, ``_rebuild_tensor_v2``, storage classes); any other
    global in the pickle raises — a restricted unpickler, not a
    general one.
    """
    zf = zipfile.ZipFile(path)
    names = zf.namelist()
    prefix = names[0].split("/", 1)[0]
    try:
        byteorder = zf.read(f"{prefix}/byteorder").decode().strip()
    except KeyError:
        byteorder = "little"  # pre-2.1 checkpoints are always LE

    def _rebuild_tensor_v2(
        storage, storage_offset, size, stride, requires_grad, backward_hooks, *extra
    ):
        key, dtype = storage
        arr = np.frombuffer(zf.read(f"{prefix}/data/{key}"), dtype=dtype)
        if byteorder == "big":
            arr = arr.byteswap()
        shape = tuple(size)
        strides = tuple(s * arr.itemsize for s in stride)
        return np.lib.stride_tricks.as_strided(
            arr[storage_offset:], shape=shape, strides=strides
        ).copy()

    class _RestrictedUnpickler(pickle.Unpickler):
        def persistent_load(self, pid):
            typ, storage_cls, key, _location, _numel = pid
            if typ != "storage":
                raise pickle.UnpicklingError(f"unsupported persistent id: {typ}")
            return (key, storage_cls)

        def find_class(self, module, name):
            if (module, name) == ("collections", "OrderedDict"):
                import collections

                return collections.OrderedDict
            if (module, name) == ("torch._utils", "_rebuild_tensor_v2"):
                return _rebuild_tensor_v2
            if module == "torch" and name in _STORAGE_DTYPES:
                return _STORAGE_DTYPES[name]
            raise pickle.UnpicklingError(f"forbidden global {module}.{name}")

    with zf.open(f"{prefix}/data.pkl") as f:
        state = _RestrictedUnpickler(f).load()
    return {k: np.asarray(v) for k, v in state.items()}


def serving_params_from_torch(
    path: str,
    surrogates: dict[str, float] | None = None,
    scaler_mean=None,
    scaler_std=None,
) -> dict:
    """Fold a reference ``SimpleModel`` checkpoint into the
    :func:`..ml.serving.predict_local` params dict.

    ``fc.weight`` is [2, n_features] (class logit rows), ``fc.bias``
    is [2]; the equivalent binary-logistic form is the row difference.
    Scaler stats / impute surrogates come from the caller (the
    reference fits sklearn's StandardScaler on its training split,
    app.py:76-78 — pass the same stats to reproduce the deployed
    pipeline end-to-end, e.g. from ``extract_serving_params``).
    """
    sd = load_torch_state_dict(path)
    w = np.asarray(sd["fc.weight"], dtype="float64")
    b = np.asarray(sd["fc.bias"], dtype="float64")
    if w.ndim != 2 or w.shape[0] != 2 or b.shape != (2,):
        raise ValueError(f"not a 2-class linear head: weight {w.shape}, bias {b.shape}")
    n_features = w.shape[1]
    return {
        "surrogates": surrogates or {},
        "scaler_mean": None if scaler_mean is None else np.asarray(scaler_mean, dtype="float64"),
        # predict_local always divides by std — identity scaling when
        # the caller brings no fitted scaler.
        "scaler_std": (
            np.ones(n_features) if scaler_std is None else np.asarray(scaler_std, dtype="float64")
        ),
        "coefficients": w[1] - w[0],
        "intercept": float(b[1] - b[0]),
    }

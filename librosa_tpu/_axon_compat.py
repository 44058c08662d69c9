"""Device→host transfer shim for the experimental ``axon`` TPU backend.

The axon PJRT tunnel does not implement host transfers of complex-typed
buffers: ``np.asarray(z)`` on a complex64/complex128 device array raises
``UNIMPLEMENTED`` — and the failed transfer leaves the runtime in a
poisoned state where *every* subsequent op fails.  Complex **compute**
works fine; only the transfer is missing.

This module wraps ``jax.Array``'s host-materialization path so that, on
axon devices only, complex arrays are fetched as two float transfers
(``real``/``imag``) and recombined on the host.  Real-dtype arrays and all
other backends go through the original fast path untouched.

Installed from ``librosa_tpu/__init__`` when an axon device is present.
"""

from __future__ import annotations

import functools

import numpy as np

_INSTALLED = False


def _is_axon(arr) -> bool:
    # Axon devices report platform 'tpu'; install() only runs when the
    # session's jax_platforms includes 'axon', so any TPU-platform device
    # here is tunnel-backed.  CPU arrays keep the fast path.
    try:
        import jax

        dev = next(iter(arr.sharding.device_set))
        plat = getattr(dev, "platform", "")
        if plat == "axon":
            return True
        return plat == "tpu" and "axon" in str(
            getattr(jax.config, "jax_platforms", "") or ""
        )
    except Exception:
        return False


def install() -> None:
    """Install the axon host↔device transfer shims (idempotent).

    The axon TPU backend cannot transfer complex buffers in either
    direction, and 0-d uploads trip a layout bug; this patches
    ``ArrayImpl._value`` (device→host: fetch real/imag separately) and
    ``pxla.batched_device_put`` (host→device: split complex operands,
    ship scalars as shape-(1,) + reshape).  Imported automatically by
    the package; calling again is a no-op.
    """
    global _INSTALLED
    if _INSTALLED:
        return

    from jax._src import array as _jarray

    impl = _jarray.ArrayImpl
    orig_prop = impl.__dict__["_value"]
    orig_fget = orig_prop.fget

    @functools.wraps(orig_fget)
    def _value_safe(self) -> np.ndarray:
        if (
            self._npy_value is None
            and np.issubdtype(self.dtype, np.complexfloating)
            and _is_axon(self)
        ):
            import jax.numpy as jnp

            re = orig_fget(jnp.real(self))
            im = orig_fget(jnp.imag(self))
            out = np.empty(
                self.shape,
                dtype=np.complex64 if self.dtype == np.complex64 else np.complex128,
            )
            out.real = re
            out.imag = im
            out.flags.writeable = False
            self._npy_value = out
            return out
        return orig_fget(self)

    impl._value = property(_value_safe)

    # --- host→device: complex uploads are equally unimplemented ---------
    from jax._src.interpreters import pxla

    orig_bdp = pxla.batched_device_put

    def _tpu_target(devices) -> bool:
        return bool(devices) and getattr(devices[0], "platform", "") == "tpu"

    def _host_complex(x):
        """Unwrap host-side values (np.ndarray / scalar / jax typed literals)."""
        if isinstance(x, (np.ndarray, np.generic, complex, float, int)):
            return np.asarray(x)
        # jax TypedNdArray / TypedComplex / TypedFloat wrap the host value
        val = getattr(x, "val", None)
        if isinstance(val, (np.ndarray, np.generic, complex, float, int)):
            return np.asarray(val)
        return None

    def batched_device_put_safe(
        aval, sharding, xs, devices, committed=True, enable_x64=None
    ):
        """Complex-safe replacement for ``pxla.batched_device_put``.

        The axon tunnel cannot transfer complex buffers host→device;
        this shim intercepts complex uploads bound for the TPU, splits
        them into real/imag float planes on the host, uploads those, and
        recombines with ``lax.complex`` on device.  Non-complex (or
        non-TPU) puts pass straight through to the original function.
        Signature mirrors jax's internal ``batched_device_put``.
        """
        if np.issubdtype(aval.dtype, np.complexfloating) and _tpu_target(devices):
            hosts = [_host_complex(x) for x in xs]
            if all(h is not None for h in hosts):
                import jax

                rdt = np.float32 if aval.dtype == np.complex64 else np.float64
                # 0-d uploads trip an axon layout bug; ship them as (1,)
                # and reshape back on device.
                scalar = aval.ndim == 0
                rshape = (1,) if scalar else aval.shape
                raval = aval.update(
                    shape=rshape, dtype=np.dtype(rdt), weak_type=False
                )
                res = [
                    np.ascontiguousarray(h.real, dtype=rdt).reshape(rshape)
                    for h in hosts
                ]
                ims = [
                    np.ascontiguousarray(h.imag, dtype=rdt).reshape(rshape)
                    for h in hosts
                ]
                re_arr = orig_bdp(raval, sharding, res, devices, committed, enable_x64)
                im_arr = orig_bdp(raval, sharding, ims, devices, committed, enable_x64)
                out = jax.lax.complex(re_arr, im_arr)
                if scalar:
                    out = jax.numpy.reshape(out, ())
                if getattr(aval, "weak_type", False):
                    out = jax.lax.convert_element_type(
                        out, aval.dtype, weak_type=True
                    )
                return out
        return orig_bdp(aval, sharding, xs, devices, committed, enable_x64)

    pxla.batched_device_put = batched_device_put_safe
    _INSTALLED = True

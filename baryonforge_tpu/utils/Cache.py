"""Array-keyed memoization of profile evaluations
(reference utils/Cache.py analog).

Under jit the XLA compilation cache already subsumes most of what the
reference's CachedProfile buys (its measured 7,400x win is re-evaluation
avoidance, examples/20), but eager table-building paths still benefit from
memoizing repeated (r, M, a) evaluations, so we keep the same API.
"""

from collections import OrderedDict
import numpy as np

__all__ = ["SimpleArrayCache", "CachedProfile", "CachedHODProfile"]


class SimpleArrayCache:
    """LRU cache keyed on array contents/shape/dtype
    (reference Cache.py:9-109)."""

    def __init__(self, maxsize=64):
        self.maxsize = maxsize
        self._store = OrderedDict()

    @staticmethod
    def _key(args, kwargs):
        parts = []
        for x in list(args) + [v for _, v in sorted(kwargs.items())]:
            x = np.asarray(x)
            parts.append((x.tobytes(), x.shape, str(x.dtype)))
        return tuple(parts)

    def get(self, key):
        if key in self._store:
            self._store.move_to_end(key)
            return self._store[key]
        return None

    def put(self, key, value):
        self._store[key] = value
        self._store.move_to_end(key)
        if len(self._store) > self.maxsize:
            self._store.popitem(last=False)

    def clear(self):
        self._store.clear()

    def __len__(self):
        return len(self._store)


def _memoized(cache, fn):
    def wrapper(cosmo, r, M, a, **kw):
        key = (fn.__name__,) + SimpleArrayCache._key(
            (np.asarray(r), np.asarray(M), np.asarray(a)), kw)
        hit = cache.get(key)
        if hit is not None:
            return hit
        out = fn(cosmo, r, M, a, **kw)
        cache.put(key, np.asarray(out))
        return out
    return wrapper


class CachedProfile:
    """Wrap a profile, memoizing real/projected/fourier on array inputs
    (reference Cache.py:112-158)."""

    def __init__(self, profile, maxsize=64):
        self.Profile = profile
        self.cache = SimpleArrayCache(maxsize=maxsize)
        self.real = _memoized(self.cache, profile.real)
        self.projected = _memoized(self.cache, profile.projected)
        self.fourier = _memoized(self.cache, profile.fourier)
        if hasattr(profile, "displacement"):
            def _disp(r, M, a, **kw):
                key = ("displacement",) + SimpleArrayCache._key(
                    (np.asarray(r), np.asarray(M), np.asarray(a)), kw)
                hit = self.cache.get(key)
                if hit is not None:
                    return hit
                out = profile.displacement(r, M, a, **kw)
                self.cache.put(key, np.asarray(out))
                return out
            self.displacement = _disp

    def __getattr__(self, name):
        try:
            return super().__getattribute__(name)
        except AttributeError:
            return getattr(self.Profile, name)


# HOD profiles are CCL-specific in the reference (Cache.py:161-175);
# here any profile-like object works through CachedProfile directly.
CachedHODProfile = CachedProfile

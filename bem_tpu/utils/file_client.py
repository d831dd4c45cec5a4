"""File IO backends (reference: basicsr/utils/file_client.py:22-167).

Disk backend always available; lmdb/memcached gated on package availability
(this image ships without lmdb — configs using it get a clear error).
"""

from __future__ import annotations


class HardDiskBackend:
    def get(self, filepath, client_key=None) -> bytes:
        with open(str(filepath), "rb") as f:
            return f.read()

    def get_text(self, filepath) -> str:
        with open(str(filepath), "r") as f:
            return f.read()


class LmdbBackend:
    def __init__(self, db_paths, client_keys="default", readonly=True, lock=False,
                 readahead=False, **kwargs):
        try:
            import lmdb
        except ImportError as e:  # pragma: no cover
            raise ImportError("Please install lmdb to enable LmdbBackend.") from e
        if isinstance(client_keys, str):
            client_keys = [client_keys]
        if isinstance(db_paths, str):
            db_paths = [db_paths]
        assert len(client_keys) == len(db_paths)
        self._client = {
            k: lmdb.open(p, readonly=readonly, lock=lock, readahead=readahead, **kwargs)
            for k, p in zip(client_keys, db_paths)
        }

    def get(self, filepath, client_key) -> bytes:
        client = self._client[client_key]
        with client.begin(write=False) as txn:
            return txn.get(str(filepath).encode("ascii"))


class MemcachedBackend:  # pragma: no cover - needs mc infra
    def __init__(self, server_list_cfg, client_cfg, sys_path=None):
        raise NotImplementedError("memcached backend requires the mc package")


class FileClient:
    """Facade dispatching on backend name (file_client.py:132-167)."""

    _backends = {
        "disk": HardDiskBackend,
        "lmdb": LmdbBackend,
        "memcached": MemcachedBackend,
    }

    def __init__(self, backend="disk", **kwargs):
        if backend not in self._backends:
            raise ValueError(
                f"Backend {backend} is not supported. Supported: {list(self._backends)}"
            )
        self.backend = backend
        self.client = self._backends[backend](**kwargs)

    def get(self, filepath, client_key="default"):
        if self.backend == "lmdb":
            return self.client.get(filepath, client_key)
        return self.client.get(filepath)

    def get_text(self, filepath):
        return self.client.get_text(filepath)

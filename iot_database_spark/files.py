"""Versioned file store — the reference's FileManager
(Iot.Database/FileManager/FileCollection.cs:107-774, FileRecord.cs:10-17,
FileVersionNode.cs:10-14).

Reference semantics: add / check-in (new version) / check-out (exclusive
lock) / rename / delete, a per-file version chain, and an access log.

Spark-first shape: blobs live OUTSIDE the engine (object store; here a
directory), while three metadata tables in the IotDatabase warehouse
carry the state:

    files(id, name, checked_out_by, current_version)
    file_versions(id, file_id, version, sha256, size, created_at, comment)
    file_access_log(id, file_id, action, actor, at)

All operations are metadata inserts/updates; version history is an
append-only chain (no in-place mutation — the Delta-friendly shape).
"""

from __future__ import annotations

import hashlib
import os
import shutil
from datetime import datetime, timezone

from pyspark.sql import functions as F

from iot_database_spark.database import IotDatabase


class FileManagerError(Exception):
    pass


class FileManager:
    def __init__(self, db: IotDatabase, blob_dir: str | None = None):
        self.db = db
        self.blob_dir = blob_dir or os.path.join(db.root, "Files")
        os.makedirs(self.blob_dir, exist_ok=True)
        self.files = db.tables(
            "files",
            "id bigint, name string, checked_out_by string, current_version int",
            unique=["name"],
        )
        self.versions = db.tables(
            "file_versions",
            "id bigint, file_id bigint, version int, sha256 string, "
            "size bigint, created_at timestamp, comment string",
        )
        self.access_log = db.tables(
            "file_access_log",
            "id bigint, file_id bigint, action string, actor string, at timestamp",
        )

    # -- operations (FileCollection.cs:107-774) ---------------------------

    def add(self, name: str, src_path: str, actor: str, comment: str = "") -> int:
        if self.files.exists(F.col("name") == name):
            raise FileManagerError(f"file {name!r} already exists; use checkin")
        self.files.insert([{
            "id": None, "name": name, "checked_out_by": None, "current_version": 1,
        }])
        file_id = self.files.find_one(F.col("name") == name)["id"]
        self._store_version(file_id, 1, src_path, comment)
        self._log(file_id, "add", actor)
        return file_id

    def checkout(self, name: str, actor: str) -> str:
        rec = self._file(name)
        if rec["checked_out_by"]:
            raise FileManagerError(
                f"{name!r} already checked out by {rec['checked_out_by']}"
            )
        self.files.update_many(
            {"checked_out_by": F.lit(actor)}, F.col("id") == rec["id"]
        )
        self._log(rec["id"], "checkout", actor)
        return self._blob_path(rec["id"], rec["current_version"])

    def checkin(self, name: str, src_path: str, actor: str, comment: str = "") -> int:
        rec = self._file(name)
        if rec["checked_out_by"] != actor:
            raise FileManagerError(
                f"{name!r} is not checked out by {actor!r}"
            )
        new_version = rec["current_version"] + 1
        self._store_version(rec["id"], new_version, src_path, comment)
        self.files.update_many(
            {
                "checked_out_by": F.lit(None).cast("string"),
                "current_version": F.lit(new_version),
            },
            F.col("id") == rec["id"],
        )
        self._log(rec["id"], "checkin", actor)
        return new_version

    def rename(self, name: str, new_name: str, actor: str) -> None:
        rec = self._file(name)
        if self.files.exists(F.col("name") == new_name):
            raise FileManagerError(f"{new_name!r} already exists")
        self.files.update_many({"name": F.lit(new_name)}, F.col("id") == rec["id"])
        self._log(rec["id"], "rename", actor)

    def delete(self, name: str, actor: str) -> None:
        rec = self._file(name)
        self._log(rec["id"], "delete", actor)
        self.files.delete(F.col("id") == rec["id"])

    def history(self, name: str):
        rec = self._file(name)
        return (
            self.versions.find(F.col("file_id") == rec["id"])
            .orderBy("version")
            .select("version", "sha256", "size", "created_at", "comment")
        )

    def log(self, name: str):
        rec = self._file(name)
        return self.access_log.find(F.col("file_id") == rec["id"]).orderBy("id")

    def open_path(self, name: str, version: int | None = None) -> str:
        rec = self._file(name)
        return self._blob_path(rec["id"], version or rec["current_version"])

    # -- internals --------------------------------------------------------

    def _file(self, name: str):
        rec = self.files.find_one(F.col("name") == name)
        if rec is None:
            raise FileManagerError(f"no such file: {name!r}")
        return rec

    def _blob_path(self, file_id: int, version: int) -> str:
        return os.path.join(self.blob_dir, f"{file_id}_v{version}")

    def _store_version(
        self, file_id: int, version: int, src_path: str, comment: str
    ) -> None:
        dst = self._blob_path(file_id, version)
        shutil.copyfile(src_path, dst)
        with open(src_path, "rb") as f:
            content = f.read()
        self.versions.insert([{
            "id": None,
            "file_id": file_id,
            "version": version,
            "sha256": hashlib.sha256(content).hexdigest(),
            "size": len(content),
            "created_at": datetime.now(timezone.utc).replace(tzinfo=None),
            "comment": comment,
        }])

    def _log(self, file_id: int, action: str, actor: str) -> None:
        self.access_log.insert([{
            "id": None,
            "file_id": file_id,
            "action": action,
            "actor": actor,
            "at": datetime.now(timezone.utc).replace(tzinfo=None),
        }])

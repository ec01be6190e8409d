"""Users / permissions layer (reference: Iot.Database/Users/
Permission.cs:6-28, UserManager.cs:9-56).

Plain dimension tables + a check helper; enforcement is app-level (the
reference checks in-process too — there is no engine-level ACL).

    users(id, name, password_sha, is_admin)
    permissions(id, user_id, resource, actions)   -- actions bitmask
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from iot_database_spark.database import IotDatabase
from iot_database_spark.tables import ForeignKey

# Permission.cs action flags
ACTION_READ = 1
ACTION_WRITE = 2
ACTION_DELETE = 4
ACTION_ADMIN = 8


class UserManager:
    def __init__(self, db: IotDatabase):
        self.db = db
        self.users = db.tables(
            "users",
            "id bigint, name string, password_sha string, is_admin boolean",
            unique=["name"],
        )
        self.permissions = db.tables(
            "permissions",
            "id bigint, user_id bigint, resource string, actions int",
            foreign_keys=[
                ForeignKey(column="user_id", parent="users", constraint="cascading")
            ],
        )

    @staticmethod
    def _hash(password: str) -> str:
        return hashlib.sha256(password.encode("utf-8")).hexdigest()

    def add_user(self, name: str, password: str, is_admin: bool = False) -> int:
        self.users.insert([{
            "id": None, "name": name,
            "password_sha": self._hash(password), "is_admin": is_admin,
        }])
        return self.users.find_one(F.col("name") == name)["id"]

    def authenticate(self, name: str, password: str) -> bool:
        rec = self.users.find_one(F.col("name") == name)
        return rec is not None and rec["password_sha"] == self._hash(password)

    def grant(self, user_id: int, resource: str, actions: int) -> None:
        self.permissions.insert([{
            "id": None, "user_id": user_id, "resource": resource, "actions": actions,
        }])

    def can(self, user_id: int, resource: str, action: int) -> bool:
        user = self.users.find_one(F.col("id") == user_id)
        if user is None:
            return False
        if user["is_admin"]:
            return True
        return self.permissions.exists(
            (F.col("user_id") == user_id)
            & (F.col("resource") == resource)
            & (F.col("actions").bitwiseAND(action) != 0)
        )

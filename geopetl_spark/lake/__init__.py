from .table import BUCKET_COL, DELETED_COL, LSN_COL, CommitConflict, LakeTable

__all__ = ["LakeTable", "CommitConflict", "BUCKET_COL", "DELETED_COL", "LSN_COL"]

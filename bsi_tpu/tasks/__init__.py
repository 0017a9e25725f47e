from .task import build_task

__all__ = ["build_task"]

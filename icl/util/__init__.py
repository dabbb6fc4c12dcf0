from icl.util.log import LogUtil

__all__ = ["LogUtil"]

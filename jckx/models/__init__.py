from jckx.models import dcgan, cgan  # noqa: F401

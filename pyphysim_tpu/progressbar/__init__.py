"""Progress display (layer: observability)."""

from .progressbar import (DummyProgressbar, ProgressBarBase,  # noqa: F401
                          ProgressBarIPython,
                          ProgressbarText, ProgressbarText2,
                          ProgressbarText3, ProgressbarZMQClient,
                          ProgressbarZMQServer,
                          ProgressbarMultiProcessServer)

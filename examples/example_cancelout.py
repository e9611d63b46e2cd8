"""Engine analog of the reference's examples/example_cancelout.py: stream a dense numeric
table through the CANCELOUT kernel (batch_size=50, num_features=5), prequential
accuracy + FSCR + run averages printed instead of plotted.

    python examples/example_cancelout.py [path/to/data.csv]   # col 0 = target
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples._common import run_example

if __name__ == "__main__":
    run_example("cancelout", kernel_kwargs={})

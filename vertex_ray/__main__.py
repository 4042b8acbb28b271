from vertex_ray.cli import main
import sys

sys.exit(main())

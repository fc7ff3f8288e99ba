from .occupancy import OccupancyGrid, OccupancyGridState

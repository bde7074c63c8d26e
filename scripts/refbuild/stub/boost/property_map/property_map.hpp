// centralized in graph_traits.hpp (scratch parity build)
#include <boost/graph/graph_traits.hpp>

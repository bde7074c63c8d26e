#include <boost/multi_index_container.hpp>

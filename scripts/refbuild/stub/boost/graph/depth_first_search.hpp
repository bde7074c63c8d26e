// DFS support shares the BFS stub pieces (scratch parity build)
#ifndef STUB_BOOST_DFS
#define STUB_BOOST_DFS 1
#include <boost/graph/breadth_first_search.hpp>
#endif

// no-op concept checks (scratch parity build)
#ifndef STUB_BOOST_GRAPH_CONCEPTS
#define STUB_BOOST_GRAPH_CONCEPTS 1
#define BOOST_CONCEPT_ASSERT(x) /* disabled in scratch build */
namespace boost { namespace concepts {} }
#endif
